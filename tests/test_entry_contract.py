"""Emulates the driver's correctness gate: run every __spark_entry__
queries() entry on Spark and its oracle_sql() on DuckDB over the same
parquet tables, compare row sets exactly (column-name-sorted, like the
driver's order-insensitive value hash)."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def entrymod():
    import __spark_entry__ as m

    return m


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm(rows, cols):
    # sort columns by name (driver behavior), normalize floats
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                v = float(f"{v:.9g}") if math.isfinite(v) else v
            if isinstance(v, bytearray):
                v = bytes(v)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


def test_entry_smoke(spark, entrymod):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert set(df.columns) == {"doc_id", "score"}


def test_every_query_has_callable(entrymod):
    qs = entrymod.queries()
    assert len(qs) >= 20
    for name, fn in qs.items():
        assert callable(fn), name


@pytest.mark.parametrize(
    "name",
    sorted(
        set(__import__("__spark_entry__").queries())
        & set(__import__("__spark_entry__").oracle_sql())
    ),
)
def test_query_vs_duckdb_oracle(spark, duck, entrymod, name):
    qdf = entrymod.queries()[name](spark, SF)
    got_cols = qdf.columns
    got = _norm([tuple(r) for r in qdf.collect()], got_cols)
    res = duck.execute(entrymod.oracle_sql()[name])
    want_cols = [d[0] for d in res.description]
    want = _norm(res.fetchall(), want_cols)
    assert sorted(got_cols) == sorted(want_cols), (got_cols, want_cols)
    assert len(got) == len(want), (name, len(got), len(want))
    mismatches = [(g, w) for g, w in zip(got, want) if g != w]
    assert not mismatches, (name, mismatches[:5])


def test_no_oracle_queries_still_run(spark, entrymod):
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    for name in set(qs) - set(os_):
        df = qs[name](spark, SF)
        df.limit(5).collect()  # must at least execute

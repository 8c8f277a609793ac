"""FEMTO query-grammar parser + randomized differential evaluation
(the test.pl pattern: generated query corpus vs an independent oracle)."""

import random

import pytest

from femto_spark.query.parser import (
    eval_with_oracle,
    parse_query,
)


def test_parse_shapes():
    n = parse_query("a b AND c")
    assert n.op == "and" and n.children[0].text == "a b"
    n = parse_query('(x OR y) NOT z')
    assert n.op == "not" and n.children[0].op == "or"
    n = parse_query("a THEN 3 b")
    assert n.op == "then" and n.dist == 3
    n = parse_query('"exact phrase" OR w')
    assert n.children[0].op == "phrase" and n.children[0].text == "exact phrase"
    with pytest.raises(ValueError):
        parse_query("a THEN x b")
    with pytest.raises(ValueError):
        parse_query("(a OR b")
    with pytest.raises(ValueError):
        parse_query("")


QUERIES = [
    "data AND table",
    "data OR table",
    "data NOT table",
    "data table",  # implicit conjunction
    "(data OR table) NOT scan",
    "the AND (merge OR sort) NOT window",
    '"data table" OR merge',
    "the THEN 3 data",
    "table WITHIN 4 scan",
    "(the THEN 2 data) OR (merge AND sort)",
    "zzznope OR data",
    "zzznope AND data",
]


@pytest.mark.parametrize("q", QUERIES)
def test_query_language_engine_vs_oracle(engine, oracle_sf001, q):
    want = sorted(eval_with_oracle(oracle_sf001, parse_query(q)))
    got = [r["doc_id"] for r in engine.query(q).collect()]
    assert got == want, q


def test_randomized_boolean_queries(engine, oracle_sf001):
    """test.pl-style: seeded random boolean trees over corpus terms."""
    rng = random.Random(7)
    terms = ["the", "data", "table", "scan", "merge", "sort", "fast", "slow", "key"]

    def rand_q(depth=0):
        if depth >= 2 or rng.random() < 0.4:
            return " ".join(rng.sample(terms, rng.randint(1, 2)))
        op = rng.choice(["AND", "OR", "NOT"])
        return f"({rand_q(depth + 1)}) {op} ({rand_q(depth + 1)})"

    batch = [rand_q() for _ in range(12)]
    for q in batch:
        want = sorted(eval_with_oracle(oracle_sf001, parse_query(q)))
        got = [r["doc_id"] for r in engine.query(q).collect()]
        assert got == want, q


def test_assign_doc_ids(spark):
    from femto_spark.index.docids import assign_doc_ids, verify_unique_key

    df = spark.createDataFrame(
        [("https://b",), ("https://a",), ("https://c",)], "url string"
    )
    got = {r["url"]: r["doc_id"] for r in assign_doc_ids(df).collect()}
    assert got == {"https://a": 0, "https://b": 1, "https://c": 2}
    # identical under different partitioning
    got2 = {
        r["url"]: r["doc_id"] for r in assign_doc_ids(df.repartition(3)).collect()
    }
    assert got2 == got
    verify_unique_key(df)
    dup = spark.createDataFrame([("u",), ("u",)], "url string")
    with pytest.raises(ValueError, match="not unique"):
        verify_unique_key(dup)


def test_assign_doc_ids_two_pass_equals_window(spark):
    """The distributed two-pass rank must equal the (single-partition)
    window plan bit-for-bit on a seeded corpus — and run with >1 task."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from femto_spark.index.docids import assign_doc_ids

    rng = random.Random(7)
    rows = [(f"https://site{rng.randrange(10**9)}.example/{i}", i % 5) for i in range(2000)]
    df = spark.createDataFrame(rows, "url string, lang int").repartition(7)

    w = Window.orderBy(F.col("url"))
    want = {
        r["url"]: r["doc_id"]
        for r in df.withColumn("doc_id", F.row_number().over(w) - 1).collect()
    }
    got_df = assign_doc_ids(df, n_partitions=6)
    got = {r["url"]: r["doc_id"] for r in got_df.collect()}
    assert got == want
    # the assignment stage runs on the range-partitioned data: >1 partition
    assert got_df.rdd.getNumPartitions() > 1
    # extra columns survive
    assert set(got_df.columns) == {"url", "lang", "doc_id"}

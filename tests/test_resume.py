"""Checkpoint-resume: a build killed between stages and rerun with
resume=True must produce an index identical to a one-shot build (the
north rule's kill-and-rerun criterion; FEMTO analog: per-bin files +
REPORT metrics let a failed femto_index restart from surviving bins)."""

import os

from pyspark.sql import functions as F


def _index_signature(spark, out):
    ix = spark.read.parquet(os.path.join(out, "index"))
    rows = ix.select(
        "term",
        "shard",
        "df",
        "n",
        F.md5(F.col("postings")).alias("ph"),
        F.md5(F.col("positions")).alias("xh"),
    ).collect()
    return sorted((r["term"], r["shard"], r["df"], r["n"], r["ph"], r["xh"]) for r in rows)


def test_kill_and_rerun_equals_oneshot(spark, tmp_path):
    from femto_spark.index import build_index

    corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    # one-shot reference build
    a = str(tmp_path / "oneshot")
    build_index(spark, corpus, a, n_buckets=8, n_salts=4)

    # interrupted build: simulate a crash after the partials stage by
    # deleting the later stages' outputs and commit markers
    b = str(tmp_path / "resumed")
    build_index(spark, corpus, b, n_buckets=8, n_salts=4)
    import shutil

    shutil.rmtree(os.path.join(b, "index"))
    shutil.rmtree(os.path.join(b, "termstats"))
    os.remove(os.path.join(b, "_COMMITTED_index.json"))
    os.remove(os.path.join(b, "_COMMITTED_termstats.json"))

    report = build_index(spark, corpus, b, n_buckets=8, n_salts=4, resume=True)
    # docs + partials stages must have been skipped
    assert "docs" not in report["stages"]
    assert "partials" not in report["stages"]
    assert "index" in report["stages"]

    assert _index_signature(spark, a) == _index_signature(spark, b)


def test_full_resume_noop(spark, tmp_path, index_dir):
    from femto_spark.index import build_index

    corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    report = build_index(
        spark, corpus, index_dir, n_buckets=8, n_salts=4, resume=True
    )
    assert report["stages"] == {}  # everything committed → nothing re-ran


def test_manifest_lineage_metrics(spark, index_dir):
    man = spark.read.parquet(os.path.join(index_dir, "manifest"))
    rows = man.collect()
    assert rows, "manifest must not be empty"
    cols = set(man.columns)
    assert {"bucket", "n_terms", "n_postings", "posting_bytes", "status"} <= cols
    assert all(r["status"] == "committed" for r in rows)
    # postings accounted exactly once across buckets
    total = sum(r["n_postings"] for r in rows)
    ix = spark.read.parquet(os.path.join(index_dir, "index"))
    assert total == ix.agg(F.sum("n")).collect()[0][0]


def test_salted_equals_unsalted(spark, tmp_path):
    """The salted two-phase merge must be a pure optimization: same index
    content as a build with a single salt (SURVEY §7.2 M3 criterion)."""
    from femto_spark.index import build_index

    corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = str(tmp_path / "salted")
    b = str(tmp_path / "unsalted")
    build_index(spark, corpus, a, n_buckets=8, n_salts=8)
    build_index(spark, corpus, b, n_buckets=8, n_salts=1)
    assert _index_signature(spark, a) == _index_signature(spark, b)

"""input_hint: 'engine indexes lang == "en" by default; tests cover the
filter' — build over a lang-filtered corpus and verify isolation."""

from pyspark.sql import functions as F


def test_lang_filtered_index(spark, tmp_path):
    from femto_spark.index import build_index
    from femto_spark.oracle import OracleIndex
    from femto_spark.query import SearchEngine

    corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    en = corpus.filter(F.col("lang") == "en")
    out = str(tmp_path / "en_ix")
    build_index(spark, en, out, n_buckets=8)
    eng = SearchEngine(spark, out, corpus=en)

    rows = en.select("doc_id", "text").collect()
    oracle = OracleIndex({r["doc_id"]: r["text"] for r in rows})
    assert eng.n_docs == oracle.n_docs < corpus.count()

    for q in ["the", "data table scan"]:
        got = [(r["doc_id"], r["score"]) for r in eng.search(q, k=10).collect()]
        assert got == oracle.search(q, k=10), q

    # non-en docs must be absent from every result
    non_en = {r["doc_id"] for r in corpus.filter(F.col("lang") != "en").collect()}
    all_docs = {r["doc_id"] for r in eng.docs_for("the").collect()}
    assert not (all_docs & non_en)

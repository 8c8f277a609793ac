"""input_hint invariant: the Spark pipeline reproduces byte-identical
extracted text per url from the html column — verified over the synthetic
Common-Crawl-style corpus (url, warc_ts, html, text, lang)."""

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def test_spark_extraction_byte_identical(spark):
    from femto_spark.corpus import extract_text, pages_dataframe

    pages = pages_dataframe(spark, 300, seed=42)

    @pandas_udf("string")
    def extract_udf(html: pd.Series) -> pd.Series:
        return html.map(lambda b: extract_text(bytes(b) if b is not None else b""))

    out = (
        pages.withColumn("re_text", extract_udf(F.col("html")))
        .select("url", "text", "re_text")
        .collect()
    )
    assert len(out) > 300  # adversarial docs appended
    for r in out:
        assert r["re_text"] == r["text"], r["url"]
        assert r["re_text"].encode("utf-8") == r["text"].encode("utf-8")


def test_pages_schema_matches_input_hint(spark):
    from femto_spark.corpus import pages_dataframe

    pages = pages_dataframe(spark, 10)
    d = dict(pages.dtypes)
    assert d["url"] == "string"
    assert d["warc_ts"] == "timestamp"
    assert d["html"] == "binary"
    assert d["text"] == "string"
    assert d["lang"] == "string"


def test_index_over_generated_pages_end_to_end(spark, tmp_path):
    """Full pipeline on the input_hint corpus: html → text → index → query,
    rank-identical vs the oracle (incl. adversarial docs: empty body,
    dup bodies, tf saturation, utf-8)."""
    from femto_spark.corpus import generate_pages
    from femto_spark.index import build_index
    from femto_spark.oracle import OracleIndex
    from femto_spark.query import SearchEngine

    rows = generate_pages(200, seed=42)
    pdf = pd.DataFrame(
        [(r["doc_id"], r["url"], r["text"]) for r in rows],
        columns=["doc_id", "url", "text"],
    )
    corpus = spark.createDataFrame(pdf)
    out = str(tmp_path / "pages_ix")
    build_index(spark, corpus, out, n_buckets=8)
    eng = SearchEngine(spark, out, corpus=corpus)
    oracle = OracleIndex({r["doc_id"]: r["text"] for r in rows})

    for q in ["t00000", "t00001 t00002", "r003", "t00000 t00017 t00123", "café"]:
        want = oracle.search(q, k=10)
        got = [(r["doc_id"], r["score"]) for r in eng.search(q, k=10).collect()]
        assert got == want, q

    # dup bodies under different urls: both doc ids must be retrievable
    dup_ids = [r["doc_id"] for r in rows if "dupbody" in r["text"]]
    assert len(dup_ids) == 2
    got_docs = sorted(r["doc_id"] for r in eng.docs_for("dupbody").collect())
    assert got_docs == sorted(dup_ids)

    # tf saturation doc ranks first for its repeated term... verify count
    occ, df = oracle.count("t00001")
    stats = eng.count("t00001").collect()[0]
    assert (stats["n_occurrences"], stats["n_docs"]) == (occ, df)

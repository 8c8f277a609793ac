"""Synthetic Common-Crawl-style corpus + the reference html→text extractor.

Mirrors the reference's fixed-seed adversarial test corpus
(`/root/reference/src/test/test.pl:31-56`: tiny docs, binary-ish docs, the
all-bytes doc, random docs) re-targeted at web pages per BASELINE.json
input_hint: columns (url, warc_ts, html, text, lang), where `text` is the
byte-identical output of `extract_text(html)` — the per-row invariant the
Spark pipeline must reproduce.

Determinism: seeded Python `random.Random`, fixed epoch timestamps, no
wall-clock anywhere. doc_id = rank of url in global sorted order
(SURVEY.md §7.3 item 4 — stable across cluster sizes).
"""

from __future__ import annotations

import datetime as _dt
import html as _html
import random
import re

VOCAB_SIZE = 10_000
ZIPF_S = 1.07
EPOCH = _dt.datetime(2025, 1, 1, tzinfo=_dt.timezone.utc)

# ---------------------------------------------------------------------------
# Reference extractor (the pinned pure function; byte-stable)
# ---------------------------------------------------------------------------

_SCRIPT_RE = re.compile(rb"(?is)<(script|style)\b[^>]*>.*?</\1>")
_COMMENT_RE = re.compile(rb"(?s)<!--.*?-->")
_TAG_RE = re.compile(rb"(?s)<[^>]*>")
_WS_RE = re.compile(r"\s+")


def extract_text(html_bytes: bytes) -> str:
    """html (binary) → text. THE reference extractor: every component
    (oracle, Spark UDF, fixtures) must call exactly this function so the
    per-url byte-identical invariant holds."""
    if html_bytes is None:
        return ""
    b = _SCRIPT_RE.sub(b" ", html_bytes)
    b = _COMMENT_RE.sub(b" ", b)
    b = _TAG_RE.sub(b" ", b)
    s = b.decode("utf-8", errors="replace")
    s = _html.unescape(s)
    return _WS_RE.sub(" ", s).strip()


# ---------------------------------------------------------------------------
# Deterministic page generator (FIXTURES.md §1)
# ---------------------------------------------------------------------------


def _zipf_weights(n: int, s: float) -> list[float]:
    return [1.0 / (i + 1) ** s for i in range(n)]


def vocab() -> list[str]:
    return [f"t{i:05d}" for i in range(VOCAB_SIZE)]


def generate_pages(n_rows: int, seed: int = 42) -> list[dict]:
    """Returns list of dicts (url, warc_ts, html, text, lang) sorted by url,
    with doc_id = sorted rank. Zipf token skew makes hot-term salting real;
    adversarial rows mirror test.pl:53-56."""
    rng = random.Random(seed)
    words = vocab()
    weights = _zipf_weights(VOCAB_SIZE, ZIPF_S)
    host_w = _zipf_weights(500, 1.2)

    rows = []
    for i in range(n_rows):
        host = rng.choices(range(500), weights=host_w, k=1)[0]
        url = f"https://site{host:04d}.example/p{i:08d}"
        n_tok = rng.randint(30, 300)
        toks = rng.choices(words, weights=weights, k=n_tok)
        title = " ".join(toks[: min(5, n_tok)])
        paras, j = [], 0
        while j < n_tok:
            step = rng.randint(8, 25)
            paras.append("<p>" + " ".join(toks[j : j + step]) + "</p>")
            j += step
        body = "".join(paras)
        if rng.random() < 0.15:
            body += "<script>var x = 'MUST_NOT_APPEAR';</script>"
        if rng.random() < 0.10:
            body += "<!-- MUST_NOT_APPEAR_EITHER --><style>.x{color:red}</style>"
        if rng.random() < 0.10:
            body += "<p>a &amp; b &lt;tag&gt;</p>"
        lang = rng.choices(["en", "de", "fr"], weights=[0.95, 0.025, 0.025], k=1)[0]
        html_doc = f"<html><head><title>{title}</title></head><body>{body}</body></html>"
        rows.append({"url": url, "html": html_doc.encode("utf-8"), "lang": lang, "_i": i})

    # adversarial docs (one each; mirrors test.pl's tiny/weird docs)
    adv = [
        ("https://adv.example/empty", b"<html><body></body></html>", "en"),
        ("https://adv.example/one", b"<html><body><p>t00001</p></body></html>", "en"),
        ("https://adv.example/dup-a", b"<html><body><p>dupbody same text</p></body></html>", "en"),
        ("https://adv.example/dup-b", b"<html><body><p>dupbody same text</p></body></html>", "en"),
        (
            "https://adv.example/punct",
            ("<html><body><p>" + _html.escape("!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~") + "</p></body></html>").encode(),
            "en",
        ),
        (
            "https://adv.example/satur",
            ("<html><body><p>" + " ".join(["t00001"] * 200) + "</p></body></html>").encode(),
            "en",
        ),
        (
            "https://adv.example/utf8",
            "<html><body><p>naïve café 東京 t00002</p></body></html>".encode("utf-8"),
            "en",
        ),
    ]
    for url, hb, lang in adv:
        rows.append({"url": url, "html": hb, "lang": lang, "_i": len(rows)})

    # plant rare terms r000..r049 in 1..20 known docs each
    for r in range(50):
        k = 1 + (r % 20)
        for m in range(k):
            tgt = rows[(r * 37 + m * 101) % len(rows)]
            tgt["html"] = tgt["html"].replace(
                b"</body>", f"<p>r{r:03d}</p></body>".encode(), 1
            )

    rows.sort(key=lambda d: d["url"])
    out = []
    for doc_id, d in enumerate(rows):
        out.append(
            {
                "doc_id": doc_id,
                "url": d["url"],
                "warc_ts": EPOCH + _dt.timedelta(seconds=d["_i"]),
                "html": d["html"],
                "text": extract_text(d["html"]),
                "lang": d["lang"],
            }
        )
    return out


def generate_pages_distributed(spark, n_rows: int, seed: int = 42, n_tok_max: int = 300):
    """Deterministic corpus generated IN PARALLEL on the executors —
    the scale path (the sequential generate_pages is the fixture path).

    Determinism without a shared RNG stream: each doc's tokens come from a
    counter-based Philox generator keyed (seed, doc_id), so any partitioning
    of the id range yields identical rows. Token draws are vectorized
    (searchsorted over the Zipf CDF). Returns (doc_id, url, text, lang).
    """
    import numpy as np
    import pandas as pd

    w = np.array(_zipf_weights(VOCAB_SIZE, ZIPF_S))
    cdf = np.cumsum(w / w.sum())
    words = np.array(vocab())
    langs = np.array(["en", "de", "fr"])

    def _gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.int64)
            texts, lang_out = [], []
            for i in ids:
                rng = np.random.Generator(np.random.Philox(key=[seed, int(i)]))
                n_tok = int(rng.integers(30, n_tok_max + 1))
                idx = np.searchsorted(cdf, rng.random(n_tok))
                texts.append(" ".join(words[idx]))
                lang_out.append(langs[int(rng.integers(0, 100)) % 3 if rng.random() < 0.05 else 0])
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "url": [f"https://gen.example/p{i:09d}" for i in ids],
                    "text": texts,
                    "lang": lang_out,
                }
            )

    ids = spark.range(n_rows).toDF("id").repartition(64)
    return ids.mapInPandas(_gen, "doc_id long, url string, text string, lang string")


def pages_dataframe(spark, n_rows: int, seed: int = 42):
    """Pages as a Spark DataFrame with the input_hint schema + doc_id."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), False),
            T.StructField("html", T.BinaryType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("lang", T.StringType(), False),
        ]
    )
    return spark.createDataFrame(generate_pages(n_rows, seed), schema)


# ---------------------------------------------------------------------------
# Additional source readers — the reference's its_* pluggable readers
# ---------------------------------------------------------------------------


def read_fasta(spark, path: str):
    """FASTA reader — the reference ships one as a pluggable reader
    (`/root/reference/src/dcx_cc/index_tool_support_files.c`,
    femto_index accepts FASTA inputs). Spark-native form: `spark.read.text`
    with record separator '>' splits the file into one row per sequence
    (scales to any file count; splittable by record). Returns
    (seq_id string, description string, sequence string): seq_id = first
    token of the header line, sequence = concatenated residue lines
    (whitespace stripped), matching how the reference glues sequence
    bodies into one indexable document."""
    from pyspark.sql import functions as F

    recs = spark.read.text(path, lineSep=">").filter(F.col("value") != "")
    header = F.split(F.col("value"), "\n", 2)
    hsplit = F.split(F.col("header"), r"\s+", 2)
    return (
        recs.select(
            F.trim(F.get(header, 0)).alias("header"),
            F.regexp_replace(
                F.coalesce(F.get(header, 1), F.lit("")), r"\s+", ""
            ).alias("sequence"),
        )
        .select(
            F.get(hsplit, 0).alias("seq_id"),
            F.coalesce(F.get(hsplit, 1), F.lit("")).alias("description"),
            "sequence",
        )
        .filter(F.col("seq_id") != "")
    )


def read_zero_delimited(spark, path: str):
    """NUL-delimited reader — the reference's zero-terminated records
    format (its_*: one document per \\x00-separated span). One row per
    record: (record string); empty trailing records dropped."""
    from pyspark.sql import functions as F

    return (
        spark.read.text(path, lineSep="\x00")
        .filter(F.col("value") != "")
        .withColumnRenamed("value", "record")
    )

"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All JVM-side expressions (whole-stage codegen) —
no Python in the hot path — with formulas simple enough to restate in
ANSI SQL for the DuckDB differential oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..tokenizer import spark_tokens_expr

# deterministic per-language marker lexicons for the heuristic classifier
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
    "fr": ["le", "la", "les", "et", "est", "une", "des", "que"],
    "es": ["el", "los", "las", "es", "una", "por", "con", "para"],
}

STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]


def token_count(corpus: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """(doc_id, n_tokens, n_unique_tokens) — whitespace/punct tokenizer."""
    toks = spark_tokens_expr(text_col)
    return corpus.select(
        F.col(id_col).alias("doc_id"),
        F.expr(f"size({toks})").cast("long").alias("n_tokens"),
        F.expr(f"size(array_distinct({toks}))").cast("long").alias("n_unique_tokens"),
    )


def quality_score(corpus: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """Heuristic quality features + composite score, all SQL-expressible:
    mean word length, stopword ratio, unique-token ratio, alpha ratio.
    score = 0.25*each, clamped ratios; rounded to 6dp for comparability."""
    toks = spark_tokens_expr(text_col)
    stop_arr = "array(" + ",".join(f"'{s}'" for s in STOPWORDS) + ")"
    n = f"size({toks})"
    uniq = f"size(array_distinct({toks}))"
    nstop = f"size(filter({toks}, t -> array_contains({stop_arr}, t)))"
    mean_len = (
        f"aggregate({toks}, cast(0.0 as double), (acc, t) -> acc + length(t))"
        f" / greatest({n}, 1)"
    )
    alpha = (
        f"cast(length(regexp_replace(lower({text_col}), '[^a-z]', '')) as double)"
        f" / greatest(length({text_col}), 1)"
    )
    return corpus.select(
        F.col(id_col).alias("doc_id"),
        F.expr(f"floor(({mean_len}) * 1e6 + 0.5) / 1e6").alias("mean_word_len"),
        F.expr(
            f"floor((cast({nstop} as double) / greatest({n}, 1)) * 1e6 + 0.5) / 1e6"
        ).alias("stopword_ratio"),
        F.expr(
            f"floor((cast({uniq} as double) / greatest({n}, 1)) * 1e6 + 0.5) / 1e6"
        ).alias("unique_ratio"),
        F.expr(f"floor(({alpha}) * 1e6 + 0.5) / 1e6").alias("alpha_ratio"),
    )


def language_id(corpus: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """Deterministic marker-lexicon language classifier:
    pred_lang = argmax over languages of marker-token hits (ties → language
    name asc, 'und' when zero hits everywhere). A real pipeline swaps in
    fastText/CLD3 behind the same signature; the rule here is deliberately
    SQL-restatable so the differential oracle can verify the plumbing."""
    toks = spark_tokens_expr(text_col)
    per_lang = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        arr = "array(" + ",".join(f"'{m}'" for m in markers) + ")"
        per_lang.append(
            f"struct(-size(filter({toks}, t -> array_contains({arr}, t))) as neg_hits,"
            f" '{lang}' as lang)"
        )
    # array_min over (neg_hits, lang) = argmax hits with lang-asc tie-break
    best = f"array_min(array({','.join(per_lang)}))"
    return corpus.select(
        F.col(id_col).alias("doc_id"),
        F.expr(
            f"case when {best}.neg_hits = 0 then 'und' else {best}.lang end"
        ).alias("pred_lang"),
        F.expr(f"-{best}.neg_hits").cast("long").alias("marker_hits"),
    )


def fingerprint(corpus: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """Order-sensitive 64-bit document fingerprint: xxhash64 chained over
    the token stream via aggregate() — a rolling-hash analogue that is
    pure JVM and deterministic. Equal fingerprints ⇔ equal token streams
    (modulo hash collisions), making it an order-aware dedup key that
    ignores punctuation/case, unlike md5(text)."""
    toks = spark_tokens_expr(text_col)
    return corpus.select(
        F.col(id_col).alias("doc_id"),
        F.expr(
            f"aggregate({toks}, cast(0 as bigint), (acc, t) -> xxhash64(acc, t))"
        ).alias("fingerprint"),
    )

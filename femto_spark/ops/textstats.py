"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All JVM-side expressions (whole-stage codegen) —
no Python in the hot path — with formulas simple enough to restate in
ANSI SQL for the DuckDB differential oracle.

Every operator materializes the tokens array as its own projection before
using it: repeating the tokenize expression inside one select re-runs the
regex split per reference (and inside higher-order lambdas it re-runs per
ELEMENT) — the materialized column is evaluated once per row.
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


def _toked(corpus: DataFrame, id_col: str, text_col: str, keep_text: bool = False):
    cols = [
        F.col(id_col).alias("doc_id"),
        F.expr(spark_tokens_expr(text_col)).alias("toks"),
    ]
    if keep_text:
        cols.append(F.col(text_col).alias("_text"))
    return corpus.select(*cols)


def token_count(corpus: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """(doc_id, n_tokens, n_unique_tokens) — whitespace/punct tokenizer."""
    return _toked(corpus, id_col, text_col).select(
        "doc_id",
        F.expr("size(toks)").cast("long").alias("n_tokens"),
        F.expr("size(array_distinct(toks))").cast("long").alias("n_unique_tokens"),
    )


def quality_score(corpus: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """Heuristic quality features, all SQL-expressible: mean word length,
    stopword ratio, unique-token ratio, alpha ratio; rounded to 6dp."""
    stop_arr = "array(" + ",".join(f"'{s}'" for s in STOPWORDS) + ")"
    mean_len = (
        "aggregate(toks, cast(0.0 as double), (acc, t) -> acc + length(t))"
        " / greatest(size(toks), 1)"
    )
    nstop = f"size(filter(toks, t -> array_contains({stop_arr}, t)))"
    alpha = (
        "cast(length(regexp_replace(lower(_text), '[^a-z]', '')) as double)"
        " / greatest(length(_text), 1)"
    )
    return _toked(corpus, id_col, text_col, keep_text=True).select(
        "doc_id",
        F.expr(f"floor(({mean_len}) * 1e6 + 0.5) / 1e6").alias("mean_word_len"),
        F.expr(
            f"floor((cast({nstop} as double) / greatest(size(toks), 1)) * 1e6 + 0.5) / 1e6"
        ).alias("stopword_ratio"),
        F.expr(
            "floor((cast(size(array_distinct(toks)) as double)"
            " / greatest(size(toks), 1)) * 1e6 + 0.5) / 1e6"
        ).alias("unique_ratio"),
        F.expr(f"floor(({alpha}) * 1e6 + 0.5) / 1e6").alias("alpha_ratio"),
    )


def language_id(corpus: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """Deterministic marker-lexicon language classifier:
    pred_lang = argmax over languages of marker-token hits (ties → language
    name asc, 'und' when zero hits everywhere). A real pipeline swaps in
    fastText/CLD3 behind the same signature; the rule here is deliberately
    SQL-restatable so the differential oracle can verify the plumbing."""
    per_lang = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        arr = "array(" + ",".join(f"'{m}'" for m in markers) + ")"
        per_lang.append(
            f"struct(-size(filter(toks, t -> array_contains({arr}, t))) as neg_hits,"
            f" '{lang}' as lang)"
        )
    # array_min over (neg_hits, lang) = argmax hits with lang-asc tie-break;
    # computed via a materialized `best` column (single evaluation)
    best = f"array_min(array({','.join(per_lang)}))"
    return (
        _toked(corpus, id_col, text_col)
        .select("doc_id", F.expr(best).alias("best"))
        .select(
            "doc_id",
            F.expr(
                "case when best.neg_hits = 0 then 'und' else best.lang end"
            ).alias("pred_lang"),
            F.expr("-best.neg_hits").cast("long").alias("marker_hits"),
        )
    )


def fingerprint(corpus: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """Order-sensitive 64-bit document fingerprint: xxhash64 chained over
    the token stream via aggregate() — a rolling-hash analogue that is
    pure JVM and deterministic. Equal fingerprints ⇔ equal token streams
    (modulo hash collisions), making it an order-aware dedup key that
    ignores punctuation/case, unlike md5(text)."""
    return _toked(corpus, id_col, text_col).select(
        "doc_id",
        F.expr(
            "aggregate(toks, cast(0 as bigint), (acc, t) -> xxhash64(acc, t))"
        ).alias("fingerprint"),
    )


def common_phrases(
    corpus: DataFrame,
    min_df: int = 2,
    max_len: int = 4,
    limit: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Most-common phrases — the femto_common analogue
    (`/root/reference/src/main/common_tool.c`: breadth-first search for
    the most common substrings in an index). Token-level restatement:
    word n-grams (n = 1..max_len) appearing in ≥ min_df documents,
    ranked (df desc, longer first, phrase asc). The BFS's frontier-
    pruning property (a frequent string's substrings are frequent) is
    the Apriori property here, and it actually prunes: a level-n
    candidate survives to the distinct+groupBy only if BOTH its
    (n−1)-token prefix and suffix were level-(n−1) survivors (two
    semi-joins against the previous frontier), and an empty level ends
    the walk — so a depth-8 request costs full-corpus explodes only as
    deep as the data supports, like the reference's frontier."""
    toked = corpus.select(
        F.col(id_col).alias("doc_id"),
        F.expr(spark_tokens_expr(text_col)).alias("toks"),
    ).persist()
    out = None
    prev = None  # previous level's surviving phrases (the BFS frontier)
    for n in range(1, max_len + 1):
        if n == 1:
            cand = toked.select("doc_id", F.explode("toks").alias("phrase"))
        else:
            expr = (
                f"transform(sequence(0, size(toks) - {n}), i -> struct("
                f" array_join(slice(toks, i + 1, {n}), ' ') as phrase,"
                f" array_join(slice(toks, i + 1, {n - 1}), ' ') as pref,"
                f" array_join(slice(toks, i + 2, {n - 1}), ' ') as suff))"
            )
            cand = (
                toked.filter(F.size("toks") >= n)
                .select("doc_id", F.explode(F.expr(expr)).alias("g"))
                .select("doc_id", "g.phrase", "g.pref", "g.suff")
                .join(
                    prev.select(F.col("phrase").alias("pref")), "pref", "semi"
                )
                .join(
                    prev.select(F.col("phrase").alias("suff")), "suff", "semi"
                )
                .select("doc_id", "phrase")
            )
        lvl = (
            cand.distinct()
            .groupBy("phrase")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") >= min_df)
            .withColumn("n_tokens", F.lit(n))
            .persist()
        )
        # full count (not limit(1)): materializes the whole level into
        # cache so later levels' semi-joins and the final union read the
        # cached frontier instead of recomputing the explode chain
        if lvl.count() == 0:
            lvl.unpersist()
            break
        prev = lvl
        out = lvl if out is None else out.union(lvl)
    toked.unpersist()
    if out is None:
        return corpus.sparkSession.createDataFrame(
            [], "phrase string, n_tokens int, df long"
        )
    return (
        out.orderBy(F.desc("df"), F.desc("n_tokens"), F.asc("phrase"))
        .limit(limit)
        .select("phrase", "n_tokens", "df")
    )

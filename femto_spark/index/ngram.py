"""Character n-gram index over the vocabulary — the pruning structure
behind substring/infix/regex/approx queries.

FEMTO answers arbitrary byte-substring queries by backward search over the
FM-index (`/root/reference/src/main/server.c:713`; NFA-over-index regex at
`src/main/nfa.c:418`). The posting-list redesign stores terms, not bytes,
so substring capability is recovered the way trigram text indexes do it
(PostgreSQL pg_trgm / Google Code Search): every vocabulary term is
decomposed into boundary-marked character 3-grams, and a query's literal
fragments prune the vocabulary to candidate terms BEFORE any regex or
edit-distance evaluation — at 10^9 vocabularies this replaces a full vocab
scan with a few gram-posting reads.

Layout: (gram_hash long, term_hash long) parquet, built once from vocab/
(lazily on first use for pre-existing indexes) and tiny relative to the
corpus (|vocab| × (avg_len − 1) int64 pairs).

Gram alphabet: terms are [a-z0-9]+, padded with '^' and '$' sentinels so
prefix- and suffix-anchored fragments prune too ('^dat' only matches
terms *starting* with "dat").
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..xxhash import xxhash64 as _xxh

N = 3  # gram width; fixed (the on-disk table is built with it)


def gram_hashes_py(fragment: str, prefix_anchor: bool, suffix_anchor: bool) -> list[int]:
    """Driver-side gram hashes of a literal fragment (Spark-parity xxhash64).
    Anchors add the same sentinels the build side uses."""
    s = ("^" if prefix_anchor else "") + fragment + ("$" if suffix_anchor else "")
    grams = {s[i : i + N] for i in range(len(s) - N + 1)}
    return [_xxh(g.encode("utf-8")) for g in sorted(grams)]


def build_vocab_ngrams(
    spark: SparkSession,
    vocab_path: str,
    out_path: str,
    vocab_df: DataFrame | None = None,
) -> None:
    """Materialize the (gram_hash, term_hash) table from the vocab table.
    One pass, JVM-only (substring + xxhash64 stay in codegen)."""
    vocab = vocab_df if vocab_df is not None else spark.read.parquet(vocab_path)
    padded = F.concat(F.lit("^"), F.col("term"), F.lit("$"))
    grams = F.expr(
        f"transform(sequence(1, length(padded) - {N - 1}),"
        f" i -> substring(padded, i, {N}))"
    )
    (
        vocab.withColumn("padded", padded)
        .select("term_hash", F.explode(F.array_distinct(grams)).alias("gram"))
        .select(F.xxhash64("gram").alias("gram_hash"), "term_hash")
        .write.mode("overwrite")
        .parquet(out_path)
    )


def ensure_vocab_ngrams(spark: SparkSession, index_dir: str) -> DataFrame:
    """Read the index's gram table, building it on first use (indexes from
    older builds don't carry it; the build is one cheap vocab pass)."""
    out = os.path.join(index_dir, "vocab_ngrams")
    marker = os.path.join(index_dir, "_COMMITTED_vocab_ngrams.json")
    vocab_marker = os.path.join(index_dir, "_COMMITTED_vocab.json")
    stale = (
        os.path.exists(marker)
        and os.path.exists(vocab_marker)
        and os.path.getmtime(marker) < os.path.getmtime(vocab_marker)
    )
    if not os.path.exists(marker) or stale:
        from .build import TableIO

        try:
            with open(os.path.join(index_dir, "stats.json")) as f:
                import json as _json

                ct = _json.load(f).get("catalog_table")
        except FileNotFoundError:
            ct = None
        vdf = TableIO(index_dir, ct).read(spark, "vocab")
        build_vocab_ngrams(spark, os.path.join(index_dir, "vocab"), out, vocab_df=vdf)
        with open(marker, "w") as f:
            f.write("{}")
    return spark.read.parquet(out)


def prune_terms_by_grams(
    vocab: DataFrame,
    ngrams: DataFrame,
    fragment: str,
    prefix_anchor: bool = False,
    suffix_anchor: bool = False,
    max_missing: int = 0,
) -> DataFrame | None:
    """Vocab rows whose term contains (at least len(grams) − max_missing
    of) the fragment's grams — a LOSSLESS overapproximation: every true
    match survives (each containment gram must be present; each edit
    destroys ≤ N grams, so edit-distance k callers pass
    max_missing = k·N). Returns None when the fragment is too short to
    prune (caller falls back to the full vocab scan)."""
    hashes = gram_hashes_py(fragment, prefix_anchor, suffix_anchor)
    required = len(hashes) - max_missing
    if not hashes or required <= 0:
        return None
    cand = (
        ngrams.filter(F.col("gram_hash").isin(hashes))
        .groupBy("term_hash")
        .agg(F.count("*").alias("_ng"))  # grams are distinct per term
        .filter(F.col("_ng") >= required)
        .select("term_hash")
    )
    return vocab.join(cand, "term_hash", "semi")


def longest_literal_run(pattern: str) -> str:
    """Longest run of plain literal chars ([a-z0-9]) in a pattern whose
    literal runs are all REQUIRED (no alternation/optional constructs) —
    see required_literal_run for the guard."""
    best, cur = "", ""
    for ch in pattern:
        if ch.isalnum() and (ch.islower() or ch.isdigit()):
            cur += ch
            if len(cur) > len(best):
                best = cur
        else:
            cur = ""
    return best


# chars whose presence makes a literal run NON-required: alternation makes
# it one branch; ? * { } make it optional/repeated; [ ] make alnum chars
# class members, not literals. Pruning with a non-required run would DROP
# true matches (observed live with '^mer|s(can|low)$').
_UNSAFE = set("|?*{}[]()\\")


def required_literal_run(pattern: str) -> str:
    """The longest literal run that every match MUST contain, or '' when
    the pattern's structure can't guarantee one (caller then skips gram
    pruning and scans the vocab — still distributed, still tiny next to
    the corpus). Conservative: any alternation/option/class/group
    construct disables pruning; '.'/'+'/anchors split runs but keep the
    remaining runs required."""
    if set(pattern) & _UNSAFE:
        return ""
    return longest_literal_run(pattern)

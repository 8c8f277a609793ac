"""Shared BM25 math — the single source of truth for rank-identical parity.

The reference engine only *counts* matches (SURVEY.md §2.6; ranking was
Lucene's job in its paper's comparison). Our north rule adds BM25 top-k,
so the exact formula must be pinned here and reused verbatim by:
  * the pure-Python oracle (femto_spark.oracle),
  * the Spark engine's vectorized scorer (femto_spark.query.engine),
  * the DuckDB oracle SQL emitted for the driver (duckdb_score_sql).

Formula (Lucene/ATIRE-style non-negative idf):
    idf(t)       = ln(1 + (N - df + 0.5) / (df + 0.5))
    tf_norm(t,d) = tf * (K1 + 1) / (tf + K1 * (1 - B + B * dl / avgdl))
    score(d, q)  = sum over distinct q-terms present in d of idf * tf_norm

Determinism rules (SURVEY.md §7.3 item 1):
  * all math in float64;
  * per-document summation in ascending-term order (all three forms);
  * tie-break (score DESC, doc_id ASC) after rounding scores to
    SCORE_DECIMALS so cross-engine ULP noise cannot flip ranks.
"""

from __future__ import annotations

import math

K1 = 1.2
B = 0.75
SCORE_DECIMALS = 6


def idf(df: int, n_docs: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def tf_norm(tf: float, dl: float, avgdl: float) -> float:
    return tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))


def bm25_term(tf: float, dl: float, df: int, n_docs: int, avgdl: float) -> float:
    return idf(df, n_docs) * tf_norm(tf, dl, avgdl)


def round_score(s: float) -> float:
    """Round half-up via exact IEEE ops (multiply, add, floor, divide) so
    Python, numpy, Spark SQL `floor(s*1e6+0.5)/1e6`, and DuckDB produce the
    same bits for the same input double. Scores are always >= 0."""
    import math as _m

    return _m.floor(s * 1e6 + 0.5) / 1e6


ROUND_SQL = "floor({s} * 1e6 + 0.5) / 1e6"  # same ops, any SQL engine


def duckdb_score_sql(tf: str, dl: str, df: str, n: str, avgdl: str) -> str:
    """DuckDB SQL fragment computing the identical per-term BM25 score.

    Parenthesization matters: evaluated as idf * (num / den), matching
    bm25_term()'s A*(B/C) order bit-for-bit.
    """
    return (
        f"(ln(1.0 + ({n} - {df} + 0.5) / ({df} + 0.5))"
        f" * (({tf} * ({K1} + 1.0))"
        f" / ({tf} + {K1} * (1.0 - {B} + {B} * {dl} / {avgdl}))))"
    )

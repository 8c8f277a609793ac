"""Shared tokenization — ONE definition, three executable forms.

The reference prepares text via a byte-escaping pass
(`/root/reference/src/main/bwt_prepare.c:192` count_file /
`:227` append_file_mem); our web-text analogue is word tokenization.
Rank-identical verification requires the Spark engine, the pure-Python
oracle, and the DuckDB oracle SQL to tokenize *identically*, so all three
forms live here and tests assert their equivalence.

Token definition: maximal runs of [a-z0-9] over the lower-cased text.
"""

from __future__ import annotations

import re

# The single source of truth.
TOKEN_PATTERN = "[a-z0-9]+"
# Complement used by split-based forms (Spark `split`, DuckDB
# `regexp_split_to_array`): splitting on this and dropping empties is
# equivalent to findall(TOKEN_PATTERN).
SPLIT_PATTERN = "[^a-z0-9]+"

_TOKEN_RE = re.compile(TOKEN_PATTERN)


def tokenize(text: str) -> list[str]:
    """Pure-Python form (oracle path)."""
    if not text:
        return []
    return _TOKEN_RE.findall(text.lower())


def spark_tokens_expr(col: str = "text") -> str:
    """Spark SQL expression form: array<string> of tokens of `col`.

    Stays JVM-side (no Python UDF): lower → split → filter empties.
    """
    return f"filter(split(lower({col}), '{SPLIT_PATTERN}'), t -> t <> '')"


def duckdb_tokens_expr(col: str = "text") -> str:
    """DuckDB SQL expression form — used by oracle_sql() so the driver's
    differential check tokenizes identically."""
    return (
        f"list_filter(regexp_split_to_array(lower({col}), '{SPLIT_PATTERN}'),"
        " t -> t <> '')"
    )

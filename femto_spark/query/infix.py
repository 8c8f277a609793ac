"""Substring / infix search over the indexed token stream.

The reference's defining query answers ANY byte substring (and a regex
superset) directly from the index — backward search at
`/root/reference/src/main/server.c:713`, NFA-over-FM-index at
`src/main/nfa.c:418` — without scanning the corpus. The posting-list
engine indexes the tokenized stream, so the equivalent contract here is:

    match `pattern` against the SPACE-JOINED TOKEN STREAM of each doc
    (exactly the sequence the index stores), touching only the vocab,
    the gram table, and the matched terms' postings — never the corpus.

Supported pattern subset: literal [a-z0-9] chars, literal spaces, and '.'
(any single character — including the inter-token space, as in POSIX).
This covers the reference's headline use (arbitrary infix literals that
cross token boundaries, e.g. 'erge fas' matching "...merge fast...") plus
single-wildcard regexes; richer ERE falls back to the scan path.

Plan shape (all DataFrame, no driver-side term lists):

  1. '.'-choices are enumerated (space vs in-token char, ≤ 2^dots ≤ 1024
     variants — patterns carry few dots); each variant splits into
     per-token fragments: [suffix, full*, prefix].
  2. each fragment prunes the vocabulary through the char-3-gram table
     (index/ngram.py) and an rlike verify — candidate TERM SETS stay as
     DataFrames of term_hash.
  3. candidates semi-join the index; positions decode once per slot;
     `anchor = pos − slot` turns the consecutive-token requirement into
     a plain groupBy(doc_id, anchor) count — the generalized-phrase
     evaluation, one shuffle, no per-doc Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..index.ngram import longest_literal_run, prune_terms_by_grams

_ALLOWED = set("abcdefghijklmnopqrstuvwxyz0123456789 .")
_MAX_DOTS = 10


def pattern_supported(pattern: str) -> bool:
    return (
        bool(pattern)
        and set(pattern) <= _ALLOWED
        and pattern.count(".") <= _MAX_DOTS
    )


def variants(pattern: str) -> list[tuple[str, ...]]:
    """All fragment-tuples the pattern can induce on the token stream:
    every '.' independently plays a space or an in-token wildcard.
    Fragment tuples with an empty MIDDLE fragment are dropped (the stream
    never has two adjacent spaces); empty EDGE fragments survive — they
    encode 'a token boundary here' (predecessor/successor must exist)."""
    if not pattern_supported(pattern):
        raise ValueError(f"unsupported infix pattern: {pattern!r}")
    dots = [i for i, c in enumerate(pattern) if c == "."]
    out = set()
    for mask in range(1 << len(dots)):
        chars = list(pattern)
        for bi, i in enumerate(dots):
            if (mask >> bi) & 1:
                chars[i] = " "
        frags = tuple("".join(chars).split(" "))
        if any(f == "" for f in frags[1:-1]):
            continue
        out.add(frags)
    return sorted(out)


def _slot_regexes(frags: tuple[str, ...]) -> list[tuple[int, str]]:
    """(slot, term-regex) for each NONEMPTY fragment; the regex anchors
    by position in the tuple (suffix / whole / prefix / infix)."""
    k = len(frags) - 1
    out = []
    for j, f in enumerate(frags):
        if f == "":
            continue
        if k == 0:
            rx = f  # single fragment: unanchored infix of one token
        elif j == 0:
            rx = f + "$"
        elif j == k:
            rx = "^" + f
        else:
            rx = "^" + f + "$"
        out.append((j, rx))
    return out


def infix_docs(engine, pattern: str) -> DataFrame:
    """Sorted distinct doc_ids whose token stream matches `pattern` —
    answered entirely from the index. See module docstring for the
    supported subset; engine.scan_docs is the raw-text fallback/oracle."""
    spark = engine.spark
    vocab = spark.read.parquet(engine._vocab_path)
    from ..index.ngram import ensure_vocab_ngrams

    ngrams = ensure_vocab_ngrams(spark, engine.index_dir)

    result: DataFrame | None = None
    for frags in variants(pattern):
        k = len(frags) - 1
        slots = _slot_regexes(frags)

        if not slots:
            # pure-space variant: any doc with ≥ len(frags) tokens
            d = engine._docs.filter(F.col("dl") >= len(frags)).select("doc_id")
            result = d if result is None else result.union(d)
            continue

        # candidate term sets per slot: gram-pruned, rlike-verified
        cands = []
        ok = True
        for j, rx in slots:
            run = longest_literal_run(rx)
            pruned = prune_terms_by_grams(
                vocab,
                ngrams,
                run,
                prefix_anchor=rx.startswith("^") and rx[1:].startswith(run),
                suffix_anchor=rx.endswith("$") and rx[:-1].endswith(run),
            )
            base = pruned if pruned is not None else vocab
            cand = base.filter(F.col("term").rlike(rx)).select("term_hash")
            cands.append((j, cand))
        if not ok:
            continue

        if len(slots) == 1 and k == 0:
            d = engine._docs_for_hashes(cands[0][1])
        else:
            # generalized phrase: anchor = pos − slot aligns consecutive
            # tokens; a doc matches at anchor a iff every slot is present
            tagged = None
            for j, cand in cands:
                rows = engine._positions_for_hashes(cand).select(
                    "doc_id",
                    (F.col("pos") - F.lit(j)).alias("anchor"),
                    F.lit(j).alias("slot"),
                )
                tagged = rows if tagged is None else tagged.union(rows)
            hits = (
                tagged.groupBy("doc_id", "anchor")
                .agg(F.countDistinct("slot").alias("ns"))
                .filter(F.col("ns") == len(slots))
            )
            # empty edge fragments = token-boundary requirements
            if frags[0] == "":
                hits = hits.filter(F.col("anchor") >= 1)
            else:
                hits = hits.filter(F.col("anchor") >= 0)
            if frags[-1] == "":
                hits = hits.join(engine._docs, "doc_id").filter(
                    F.col("anchor") + k <= F.col("dl") - 1
                )
            d = hits.select("doc_id")
        result = d if result is None else result.union(d)

    if result is None:
        return spark.createDataFrame([], "doc_id long")
    return result.distinct().orderBy("doc_id")

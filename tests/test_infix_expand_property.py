"""Property test for the pure-Python half of infix search: expand() +
streamline() are REWRITES of the pattern, so on the docs plane (match
existence against a stream) the union of the rewritten branches must
equal the original pattern under Python `re.search` — for EVERY pattern
the grammar accepts, not just the hand-picked differential cases.
Patterns expand() rejects (ValueError → scan fallback) are skipped;
anything else it emits is checked for exact search-equivalence. This
pins _split_alternation / _match_paren / _rewrite_dot_quants /
_fix_edge_groups / bounded-repeat expansion against the reference
semantics (`/root/reference/src/main/nfa.c:418` answers the same ERE
subset over the FM-index; Python `re` is the executable oracle here).
"""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from femto_spark.query.infix import expand, streamline


def _patterns(depth: int):
    lit_run = st.text(alphabet="abxy01", min_size=1, max_size=3)
    cls = st.sampled_from(["[ab]", "[xy1]", "[a-d]"])
    atom = st.one_of(lit_run, st.just("."), st.just(" "), cls)
    if depth > 0:
        body = st.lists(_patterns(depth - 1), min_size=1, max_size=3).map(
            "|".join
        )
        quant = st.sampled_from(
            ["", "", "", "?", "*", "+", "{2}", "{1,2}", "{2,}", "{0,1}"]
        )
        atom = st.one_of(
            atom, st.builds(lambda b, q: f"({b}){q}", body, quant)
        )
    return st.lists(atom, min_size=1, max_size=4).map("".join)


@settings(max_examples=400, deadline=None)
@given(
    pat=_patterns(2),
    streams=st.lists(
        st.text(alphabet="abxy01 ", max_size=12), min_size=5, max_size=8
    ),
)
def test_expand_streamline_search_equivalence(pat, streams):
    try:
        branches = [streamline(b) for b in expand(pat)]
    except ValueError:
        return  # documented scan fallback — out of scope here
    for s in streams:
        want = bool(re.search(pat, s))
        got = any(b == "" or re.search(b, s) for b in branches)
        assert got == want, (pat, s, branches)


@settings(max_examples=400, deadline=None)
@given(
    pat=_patterns(2),
    streams=st.lists(
        st.text(alphabet="abxy01 ", max_size=12), min_size=5, max_size=8
    ),
)
def test_expand_with_rep_probe_search_equivalence(pat, streams):
    """Same equivalence with INTERIOR unbounded group repetition
    finite-ized: a probe answering kmax = max stream length is sound
    here because a nonempty body consumes ≥ 1 char per repeat, so no
    stream of length L can realize more than L repeats — the branch
    union must then be search-equivalent on these streams (the runtime
    probe computes the same bound from the corpus via monotone
    emptiness instead)."""
    kmax = max((len(s) for s in streams), default=0)
    try:
        branches = [
            streamline(b)
            for b in expand(pat, rep_kmax=lambda body, lo: max(lo, kmax))
        ]
    except ValueError:
        return  # documented scan fallback (incl. branch blow-up)
    for s in streams:
        want = bool(re.search(pat, s))
        got = any(b == "" or re.search(b, s) for b in branches)
        assert got == want, (pat, s, branches)

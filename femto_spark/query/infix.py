"""Substring / infix search over the indexed token stream.

The reference's defining query answers ANY byte substring (and a regex
superset) directly from the index — backward search at
`/root/reference/src/main/server.c:713`, NFA-over-FM-index at
`src/main/nfa.c:418` — without scanning the corpus. The posting-list
engine indexes the tokenized stream, so the equivalent contract here is:

    match `pattern` against the SPACE-JOINED TOKEN STREAM of each doc
    (exactly the sequence the index stores), touching only the vocab,
    the gram table, and the matched terms' postings — never the corpus.

Supported pattern subset: literal [a-z0-9] chars, literal spaces, '.'
(any single character — including the inter-token space, as in POSIX),
character classes `[abc]`/`[a-f0-3]` (in-token), quantifiers
`+ * ? {m,n}` applied to literals/classes/groups (in-token; quantified
'.' is rejected — it could span arbitrarily many token boundaries),
top-level alternation `A|B`, and groups `(A|B)`:

  * an IN-TOKEN group (no space or '.' in its body, e.g. `(cd|ef)`)
    stays a single opaque regex unit inside its fragment — quantified
    groups like the reference's `ab(cd|ef)+cd` template
    (`/root/reference/src/main/nfa.c:418`, test.pl:343-364) evaluate as
    one vocab rlike, no expansion blow-up;
  * a group whose body crosses token boundaries (contains ' ' or '.')
    is expanded branch-wise into separate patterns union'd together;
    a BOUNDED repetition `(X){m,n}` expands to textual repeats (regex
    concatenation semantics); an UNBOUNDED repetition (`*`, `+`,
    `{m,}`) at a pattern EDGE rewrites away (_fix_edge_groups — both
    planes report doc ids, so unanchored search keeps only the
    edge-side repetition: `(X)+R` ≡ `(X)R`, `(X)*R` ≡ `R`); an
    INTERIOR unbounded repetition `A(X)+B` finite-izes through a DATA
    probe (_make_rep_probe): index-answered emptiness of X^k is
    monotone in k (a stream containing X^{k+1} contains X^k), so the
    corpus itself bounds the repeat count and the quantifier expands
    to the exact branch set `(X){lo}…(X){kmax}` — > _REP_CAP corpus
    repeats or branch blow-up past _MAX_EXPANSIONS → scan fallback;
  * NESTED groups are supported: an in-token nested group stays inside
    its opaque regex unit (rlike evaluates it natively); a cross-token
    one branch-expands recursively, innermost groups resolving on the
    re-entry into expand().

Unbounded dot gaps (`.*`/`.+`) are index-answered too: EDGE gaps
rewrite away per branch (streamline(), the reference's
query_planning.c fix_initial/fix_final analogue; adjacent literal dot
runs fold into the gap) and INTERIOR gap chains `P0.*P1.*…Pk` up to
_MAX_GAPS gaps evaluate as token-merge masks decided by greedy
positional chains (detect_gaps / _gapk_docs). Parts may span MULTIPLE
tokens — literal spaces split a part into consecutive-token slot
fragments and in-part dots enumerate space/char choices — so
phrase-gap-phrase shapes like `merge fast.*table scan` stay on the
index. Interior dot runs around a gap fold into it (`.*.`≡`..*`≡`.+`,
_fold_gap_runs), and the guard dot runs a `.+`/`.{m,}` edge leaves
behind thread through the chain as positional edge guards, exact for
runs ≤ _MAX_EDGE_GUARD (see detect_gaps). A literal space adjacent to
a `.*` gap (`a .*b` — the gap meets a token boundary exactly) is an
empty edge fragment: a required successor/predecessor-token constraint
with the merge mask forbidden on that gap (a DOUBLE-flush gap — spaces
on both sides, `a .* b` / `a .+ b` — additionally forces a full token
between the groups: the two consumed spaces are distinct chars).
SINGLE-flush `.+` gaps (`a .+b` / `a.+ b`) and interior MIN-m gaps up
to m ≤ _MAX_GAP_MIN (`.+.+` ≡ `.*..` ≡ `.{2,}`, user-written `.{m,}`)
resolve through MARGIN-LEVEL starts: an adjacent placement is valid
only when the boundary-token matches leave enough head/tail margin
chars for the gap, so the greedy chain carries one frontier per
needed tail-margin level (_gap_cells; a margin-k start is also a
margin-(k−1) start, which keeps the greedy propagation complete).
Where a cell depends on the length of the ONE token adjacent to a
group — flush min-m adjacency, edge guards up to _MAX_EDGE_GUARD
(including on boundary-exact edges) — the lg filter decides it from
the index: terms SHORTER than k are a tiny candidate set, and the
positions plane lists every slot, so "long token at a+δ" is an
anti-join against the short terms' positions (long_at, _guard_cells).
Remaining scan-fallback residue: gap minima above _MAX_GAP_MIN and
guard runs past _MAX_EDGE_GUARD (g = 4 on a flush edge) — their cells
would need TWO token lengths at once — and the data-dependent
interior-repetition caps above.

This covers the reference's headline use (arbitrary infix literals
crossing token boundaries, e.g. 'erge fas' matching "...merge fast...")
plus the full ERE subset its test templates exercise. Every fragment
must contain at least one REQUIRED unit (not ?- or *-quantified) so
token-boundary semantics stay exact.

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

from ..index.ngram import prune_terms_by_grams

_LITERALS = set("abcdefghijklmnopqrstuvwxyz0123456789")
# ≤ _ENUM_DOTS wildcards: 2^d variant enumeration (simplest plan, the
# common case). Above it: the O(d²) per-boundary positional DP
# (_dp_docs) — no wildcard-count limit on the Spark path. _MAX_DOTS only
# bounds variants() itself (the serving plane still enumerates).
_ENUM_DOTS = 6
_MAX_DOTS = 10
_MAX_EXPANSIONS = 64  # cap on branch-expanded pattern count


def _split_alternation(body: str) -> list[str]:
    """Split on '|' at depth 0 — '|' inside a (group) or a [class]
    belongs to that construct, not the top level."""
    parts, cur, depth, in_class = [], [], 0, False
    for c in body:
        if c == "[":
            in_class = True
        elif c == "]":
            in_class = False
        elif c == "(" and not in_class:
            depth += 1
        elif c == ")" and not in_class:
            depth -= 1
        if c == "|" and depth == 0 and not in_class:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(c)
    parts.append("".join(cur))
    return parts


import re as _re

_DOT_QUANT = _re.compile(r"\.(\?|\{(\d+)(?:,(\d+))?\})")


def _match_paren(pattern: str, i: int) -> int:
    """Index of the ')' balancing the '(' at i (class-aware), or -1."""
    depth, in_class = 0, False
    for j in range(i, len(pattern)):
        c = pattern[j]
        if c == "[":
            in_class = True
        elif c == "]":
            in_class = False
        elif c == "(" and not in_class:
            depth += 1
        elif c == ")" and not in_class:
            depth -= 1
            if depth == 0:
                return j
    return -1


def _rewrite_dot_quants(pattern: str) -> str:
    """BOUNDED dot quantifiers are finite and expand to dot-run
    alternation before group expansion: `.{m,n}` → `(.|..|…)` (a
    cross-token group — the existing branch machinery evaluates it) and
    `.?` → `(.)?`. Only the genuinely token-unbounded forms (`.*`, `.+`,
    `.{m,}`) are left for _units() to reject — a `.{0,12}` could span at
    most 12 characters of the stream, which the variant/DP planes handle
    like any other dots."""

    def _sub(m):
        q = m.group(1)
        if q == "?":
            lo, hi = 0, 1
        elif m.group(3) is not None:
            lo, hi = int(m.group(2)), int(m.group(3))
        else:
            # `.{m,}` never reaches here: _DOT_QUANT's `{m(,n)?}` arm has
            # no open-ended form, so a match without group(3) is `.{m}`
            lo = hi = int(m.group(2))
        if hi == 0:
            return ""  # `.{0}` / `.{0,0}` matches only the empty string
        if hi < lo or hi > 12:
            return m.group(0)  # malformed / too wide — rejected downstream
        branches = "|".join("." * k for k in range(max(lo, 1), hi + 1))
        return f"({branches})" + ("?" if lo == 0 else "")

    return _DOT_QUANT.sub(_sub, pattern)


def _rmatch_paren(pattern: str, j: int) -> int:
    """Index of the '(' balancing the ')' at j (scanning left), or -1."""
    depth = 0
    for i in range(j, -1, -1):
        c = pattern[i]
        if c == ")":
            depth += 1
        elif c == "(":
            depth -= 1
            if depth == 0:
                return i
    return -1


_HEAD_GRP_QUANT = _re.compile(r"([*+])|\{(\d+),\}")
_TAIL_GRP_QUANT = _re.compile(r"\)\{(\d+),\}$")


def _fix_edge_groups(pattern: str, head: bool, tail: bool) -> str:
    """streamline_query applied to GROUP repetition — the reference's
    fix_initial/fix_final (`query_planning.c:24-218`) analogue for an
    unbounded cross-token group at an UNANCHORED pattern edge. Both
    infix planes report doc ids only, and a search match with k repeats
    always contains a match keeping only the edge-side repetition(s):

      head: `(X)*R` ≡ `R`    `(X)+R` ≡ `(X)R`    `(X){m,}R` ≡ `(X){m}R`
      tail: `R(X)*` ≡ `R`    `R(X)+` ≡ `(X)` kept once, symmetric

    so the rewrite turns "unbounded cross-token repetition unsupported"
    into the already-index-answered unquantified/bounded forms. Only
    cross-token bodies rewrite (in-token quantified groups are native
    opaque units); interior unbounded repetition has no finite form and
    still raises. `head`/`tail` track whether this subpattern retains
    the full pattern's unanchored edge through expand()'s recursion."""
    while head and pattern.startswith("("):
        j = _match_paren(pattern, 0)
        if j < 0 or j + 1 >= len(pattern):
            break
        body = pattern[1 : j]
        if " " not in body and "." not in body:
            break
        m = _HEAD_GRP_QUANT.match(pattern, j + 1)
        if m is None:
            break
        if m.group(1) == "*":
            pattern = pattern[m.end() :]
            continue  # the new head may be another edge group
        if m.group(1) == "+":
            pattern = pattern[: j + 1] + pattern[m.end() :]
        else:  # {m,}
            pattern = (
                pattern[: j + 1]
                + "{%d}" % int(m.group(2))
                + pattern[m.end() :]
            )
        break  # group survives unquantified/bounded: head is settled
    while tail:
        if pattern.endswith(")*") or pattern.endswith(")+"):
            i0, q = _rmatch_paren(pattern, len(pattern) - 2), pattern[-1]
            cut = len(pattern) - 2
        else:
            mt = _TAIL_GRP_QUANT.search(pattern)
            if mt is None:
                break
            i0, q = _rmatch_paren(pattern, mt.start()), "{"
            cut = mt.start()
        if i0 < 0:
            break
        body = pattern[i0 + 1 : cut]
        if " " not in body and "." not in body:
            break
        if q == "*":
            pattern = pattern[:i0]
            continue
        if q == "+":
            pattern = pattern[:-1]
        else:  # {m,}
            pattern = pattern[: cut + 1] + "{%d}" % int(mt.group(1))
        break
    return pattern


def expand(
    pattern: str,
    *,
    head: bool = True,
    tail: bool = True,
    rep_kmax=None,
) -> list[str]:
    """Expand top-level alternation and CROSS-TOKEN groups (body contains
    ' ' or '.') into a list of patterns whose only remaining groups are
    in-token — those stay opaque regex units for _units(). Unquantified
    cross-token groups ('?' adds the empty branch) and bounded
    repetitions expand; EDGE-unbounded repetitions rewrite away
    (_fix_edge_groups); bounded dot quantifiers are rewritten to dot-run
    alternation first (_rewrite_dot_quants).

    INTERIOR unbounded cross-token repetition (`A(X)+B` / `(X)*` /
    `(X){m,}` away from every unanchored edge) is finite-ized through
    `rep_kmax(body, lo) -> int`, a DATA probe: the largest k for which
    any document's stream still contains k consecutive textual repeats
    of `body` (monotone — a stream containing X^{k+1} contains X^k — so
    an emptiness probe per k terminates). With the probe the quantifier
    expands to the exact finite branch set `(X){lo} … (X){kmax}` for
    this corpus; without one (rep_kmax=None) it raises ValueError (scan
    fallback). The probe may itself raise (cap exceeded) → scan."""
    pattern = _rewrite_dot_quants(pattern)
    tops = _split_alternation(pattern)
    if len(tops) > 1:
        out: list[str] = []
        for t in tops:
            if not t:
                raise ValueError(f"empty alternation branch: {pattern!r}")
            out.extend(expand(t, head=head, tail=tail, rep_kmax=rep_kmax))
        if len(out) > _MAX_EXPANSIONS:
            raise ValueError(f"alternation expands too wide: {pattern!r}")
        return out
    if head or tail:
        pattern = _fix_edge_groups(pattern, head, tail)

    i = pattern.find("(")
    if i < 0:
        return [pattern]
    j = _match_paren(pattern, i)
    if j < 0:
        raise ValueError(f"unbalanced group in {pattern!r}")
    body = pattern[i + 1 : j]
    if not body:
        raise ValueError(f"empty group in {pattern!r}")
    if " " not in body and "." not in body:
        # in-token group (nested parens included — the whole body is
        # space/dot-free, so it stays ONE opaque regex unit for _units):
        # expand only the tail
        # the tail keeps the full pattern's TAIL edge but not its head
        return [
            pattern[: j + 1] + rest
            for rest in expand(
                pattern[j + 1 :], head=False, tail=tail, rep_kmax=rep_kmax
            )
        ] if j + 1 < len(pattern) else [pattern]
    # cross-token group: branch-expand ('?' = empty branch; a BOUNDED
    # repetition {m} / {m,n} expands to textual repeats — regex
    # semantics concatenate the body, so `(a b){2}` ≡ `a ba b` — and
    # each repeat re-enters expand() to resolve its own branches).
    # Nested groups inside a branch are handled by the recursion too.
    # Only genuinely UNBOUNDED cross-token repetition (*, +, {m,})
    # has no finite fragment form and stays on the scan path.
    quant = pattern[j + 1] if j + 1 < len(pattern) else ""
    branches = [b for b in _split_alternation(body)]
    if any(not b for b in branches):
        raise ValueError(f"empty branch in group: {pattern!r}")

    def _rep_expand(lo_r: int, hi_r: int, qend: int) -> list[str]:
        grp = pattern[i : j + 1]
        out: list[str] = []
        for reps in range(lo_r, hi_r + 1):
            out.extend(
                expand(
                    pattern[:i] + grp * reps + pattern[qend:],
                    head=head,
                    tail=tail,
                    rep_kmax=rep_kmax,
                )
            )
        if len(out) > _MAX_EXPANSIONS:
            raise ValueError(f"group expands too wide: {pattern!r}")
        return out

    if quant == "{":
        jq = pattern.find("}", j + 1)
        spec = pattern[j + 2 : jq] if jq > 0 else ""
        mu = _re.fullmatch(r"(\d+),", spec)
        if jq > 0 and mu:  # `(X){m,}` — interior unbounded, probe-bounded
            if rep_kmax is None:
                raise ValueError(
                    "interior unbounded cross-token repetition "
                    f"unsupported without a probe: {pattern!r}"
                )
            lo_r = int(mu.group(1))
            return _rep_expand(lo_r, rep_kmax(body, lo_r), jq + 1)
        mq = _re.fullmatch(r"(\d+)(?:,(\d+))?", spec)
        if jq < 0 or not mq:
            raise ValueError(f"unsupported quantifier: {pattern!r}")
        lo_r = int(mq.group(1))
        hi_r = int(mq.group(2)) if mq.group(2) else lo_r
        if hi_r < lo_r or hi_r > 4:
            raise ValueError(
                f"cross-token group repetition too wide: {pattern!r}"
            )
        return _rep_expand(lo_r, hi_r, jq + 1)
    if quant in ("+", "*"):
        # edge-positioned ones were rewritten by _fix_edge_groups; what
        # reaches here is genuinely INTERIOR unbounded repetition —
        # finite-ize it through the data probe (kmax < lo ⇒ the branch
        # cannot match this corpus and expands to nothing)
        if rep_kmax is None:
            raise ValueError(
                "interior unbounded cross-token repetition "
                f"unsupported without a probe: {pattern!r}"
            )
        lo_r = 1 if quant == "+" else 0
        return _rep_expand(lo_r, rep_kmax(body, lo_r), j + 2)
    k = j + 1
    if quant == "?":
        branches.append("")
        k = j + 2
    out = []
    for b in branches:
        out.extend(
            expand(
                pattern[:i] + b + pattern[k:],
                head=head,
                tail=tail,
                rep_kmax=rep_kmax,
            )
        )
    if len(out) > _MAX_EXPANSIONS:
        raise ValueError(f"group expands too wide: {pattern!r}")
    return out


def _units(pattern: str) -> list[tuple[str, str]]:
    """Lex the pattern into (kind, regex-text) units: 'lit' | 'dot' |
    'space' | 'class' | 'group' | 'quant'. Raises ValueError on anything
    outside the supported subset (see module docstring). Groups reaching
    here are in-token (expand() rewrote the rest): every branch must lex
    to a non-empty, space/dot-free, required unit sequence."""
    units: list[tuple[str, str]] = []
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c in _LITERALS:
            units.append(("lit", c))
            i += 1
        elif c == " ":
            units.append(("space", " "))
            i += 1
        elif c == ".":
            units.append(("dot", "."))
            i += 1
        elif c == "(":
            j = _match_paren(pattern, i)
            body = pattern[i + 1 : j] if j >= 0 else ""
            if j < 0 or not body:
                raise ValueError(f"unsupported group in {pattern!r}")
            for b in _split_alternation(body):
                if not b:
                    raise ValueError(f"empty branch in {pattern!r}")
                sub = _units(b)  # recursive: nested in-token groups OK
                if any(k in ("space", "dot") for k, _ in sub):
                    raise ValueError(
                        f"cross-token group must be pre-expanded: {pattern!r}"
                    )
                if not _has_required(sub):
                    raise ValueError(
                        f"group branch {b!r} can match empty: {pattern!r}"
                    )
            units.append(("group", pattern[i : j + 1]))
            i = j + 1
        elif c == "[":
            j = pattern.find("]", i + 1)
            body = pattern[i : j + 1] if j >= 0 else ""
            inner = body[1:-1]
            if (
                j < 0
                or not inner
                or not set(inner) <= (_LITERALS | {"-"})
            ):
                raise ValueError(f"unsupported class in infix pattern: {pattern!r}")
            units.append(("class", body))
            i = j + 1
        elif c in "+*?" or c == "{":
            if c == "{":
                j = pattern.find("}", i + 1)
                body = pattern[i : j + 1] if j >= 0 else ""
                if j < 0 or not all(
                    ch.isdigit() or ch == "," for ch in body[1:-1]
                ) or not body[1:-1]:
                    raise ValueError(f"unsupported quantifier: {pattern!r}")
                quant = body
                i = j + 1
            else:
                quant = c
                i += 1
            if not units or units[-1][0] not in ("lit", "class", "group"):
                # quantified '.' could span token boundaries; leading
                # quantifiers are malformed
                raise ValueError(f"unsupported quantifier placement: {pattern!r}")
            units.append(("quant", quant))
        else:
            raise ValueError(f"unsupported infix pattern: {pattern!r}")
    return units


def _optional_quant(q: str) -> bool:
    """Does this quantifier allow ZERO occurrences of its unit?"""
    return q in ("*", "?") or (q.startswith("{0"))


def _has_required(funits: list[tuple[str, str]]) -> bool:
    """≥1 unit that every match must consume (not ?/*-quantified)."""
    for idx, (k, _) in enumerate(funits):
        if k in ("lit", "class", "dot", "group"):
            nxt = funits[idx + 1] if idx + 1 < len(funits) else None
            if not (nxt and nxt[0] == "quant" and _optional_quant(nxt[1])):
                return True
    return False


def required_run_from_units(funits: list[tuple[str, str]]) -> str:
    """Longest literal run every match of this fragment must contain —
    computed from unit structure, so group/class-bearing fragments still
    gram-prune on their required literal stretches (required_literal_run
    on the regex TEXT conservatively bails on any '('/'['). A lit whose
    quantifier is optional is dropped; a '+'/'{m,}' lit keeps its char
    but splits the run (contiguity beyond one occurrence isn't
    guaranteed); class/group/dot split the run."""
    best = cur = ""
    for idx, (k, t) in enumerate(funits):
        if k == "quant":
            continue
        nxt = funits[idx + 1] if idx + 1 < len(funits) else None
        quant = nxt[1] if nxt and nxt[0] == "quant" else None
        if k == "lit" and quant is None:
            cur += t
        elif k == "lit" and not _optional_quant(quant):
            cur += t  # one occurrence guaranteed, adjacent to cur
            if len(cur) > len(best):
                best = cur
            cur = ""
        else:  # optional lit, class, group, dot — breaks the run
            cur = ""
        if len(cur) > len(best):
            best = cur
    return best


def pattern_supported(pattern: str) -> bool:
    """True iff infix_docs will accept the pattern. Must mirror what
    infix_docs actually evaluates: branches are streamline()d (edge gaps
    rewritten away), gap chains up to _MAX_GAPS go to the positional
    chain evaluator, ≤ _ENUM_DOTS wildcards go through variants() (which
    applies the all-optional-fragment rejection), more through the
    positional DP (same rejection, checked per realizable segment by
    _dp_validate) — there is no wildcard-count rejection on the Spark
    path anymore, only the structural subset. Interior unbounded group
    repetition is structurally accepted (a stub probe stands in for the
    data probe); at evaluation time the probe can still raise — corpus
    needs > _REP_CAP repeats, or the probed branch set exceeds
    _MAX_EXPANSIONS — and those data-dependent cases fall to scan."""
    if not pattern:
        return False
    try:
        for p in expand(pattern, rep_kmax=lambda body, lo: max(lo, 1)):
            p = streamline(p)
            if p == "" or detect_gaps(p) is not None:
                continue
            if p.count(".") > _ENUM_DOTS:
                _dp_validate(p)
            else:
                variants(p)
        return True
    except ValueError:
        return False


_GAP_RX = _re.compile(r"\.(?:([*+])|\{(\d+),\})")
# interior gaps with min-char count up to _MAX_GAP_MIN are exact on the
# positional plane (margin-level cells, _gap_cells); larger minima need
# intermediate-token lengths → scan
_MAX_GAP_MIN = 3


def _gap_min(m: "_re.Match") -> int:
    if m.group(1) is not None:
        return 0 if m.group(1) == "*" else 1
    return int(m.group(2))
_EDGE_HEAD = _re.compile(r"^(\.*)\.(?:(\*)|(\+)|\{(\d+),\})")
_EDGE_TAIL = _re.compile(r"\.(?:(\*)|(\+)|\{(\d+),\})(\.*)$")
_MAX_GAPS = 4  # gap chains: 2^k merge combos, capped tiny
# edge guard dots folded into a gap chain: guard-cell tables
# (_guard_cells) are exact while at most ONE adjacent token's length
# binds — g ≤ 4 on a plain edge, g ≤ 3 on a boundary-exact one; longer
# runs need a multi-token lookback and fall to the scan
_MAX_EDGE_GUARD = 4


def streamline(pattern: str) -> str:
    """The reference's streamline_query rewrite
    (`/root/reference/src/main/query_planning.c:24-218`,
    `fix_initial`/`fix_final`): for UNANCHORED stream search an
    edge-unbounded dot gap reduces to at most a fixed dot run —

      `.*B` ≡ `B`        `A.*` ≡ `A`        (zero-or-more: drop)
      `.+B` ≡ `.B`       `A.+` ≡ `A.`       (the one-position guard)
      `.{m,}B` ≡ `.{m}B` (≡ m dots)         and symmetrically at the tail

    because the surplus characters the gap would consume are exactly the
    characters unanchored matching already ignores. A literal dot run
    adjacent to an edge gap folds into it (`..*B` ≡ `.{1,}B` ≡ `.B`),
    so the rewrite loops until the edge is a plain dot run. Applied per
    expanded branch (an in-token group can't contain '.', so a textual
    edge match IS an edge gap). May return "" (`.*` alone) — the
    match-everything pattern, handled by the callers.

    The guard dots a `.+`/`.{m,}` edge leaves behind combine with every
    downstream plane; an interior gap chain carries them as positional
    edge guards (detect_gaps head/tail, exact for runs ≤
    _MAX_EDGE_GUARD — longer runs fall to the scan)."""
    while True:
        m = _EDGE_HEAD.match(pattern)
        if m is None:
            break
        guard = len(m.group(1)) + (1 if m.group(3) else int(m.group(4) or 0))
        pattern = "." * guard + pattern[m.end():]
    while True:
        m = _EDGE_TAIL.search(pattern)
        if m is None:
            break
        guard = len(m.group(4)) + (1 if m.group(2) else int(m.group(3) or 0))
        pattern = pattern[: m.start()] + "." * guard
    return pattern


_GAP_RUN_RX = _re.compile(r"(?:\.(?:[*+]|\{\d+,\})?)+")


def _fold_gap_runs(pattern: str) -> str:
    """A maximal interior run mixing `.*`/`.+`/`.{m,}` gaps and literal
    dots folds to one canonical gap: the run requires m = (#dots +
    Σ gap minima) chars with no upper bound, so `.*.` ≡ `..*` ≡ `.+`,
    `.*.*` ≡ `.*`, `.+.+` ≡ `.{2,}`. m == 0 → `.*`; m == 1 → `.+`;
    2 ≤ m ≤ _MAX_GAP_MIN → `.{m,}` (margin-level cells evaluate it —
    _gap_cells); larger minima would need intermediate-token lengths —
    the run is left in place and detect_gaps rejects the dot-edged part
    it creates (scan fallback). Pure-dot runs are literal wildcards,
    untouched; EDGE runs were already rewritten by streamline()."""
    out, last = [], 0
    for m in _GAP_RUN_RX.finditer(pattern):
        seg = m.group(0)
        if "*" not in seg and "+" not in seg and "{" not in seg:
            continue
        mins, j = 0, 0
        while j < len(seg):
            if j + 1 < len(seg) and seg[j + 1] in "*+":
                mins += seg[j + 1] == "+"
                j += 2
            elif j + 1 < len(seg) and seg[j + 1] == "{":
                k = seg.index("}", j)
                mins += int(seg[j + 2 : k - 1])
                j = k + 1
            else:
                mins += 1
                j += 1
        if mins > _MAX_GAP_MIN:
            continue
        out.append(pattern[last : m.start()])
        out.append(
            ".*" if mins == 0 else ".+" if mins == 1 else f".{{{mins},}}"
        )
        last = m.end()
    out.append(pattern[last:])
    return "".join(out)


_MAX_GAP_COMBOS = 16


def _gap_part_variants(parts: list[str]):
    """Per-part variant fragment-tuples (variants(): every in-part dot
    independently plays a space or an in-token char), validated for the
    positional chain. EDGE fragments may be EMPTY — a literal space at a
    part edge means the part consumes the inter-token space itself, so
    the part's match meets a token boundary exactly (`a .*b`: the 'a'
    token must have a successor and the gap starts at that successor's
    first char). Empty edges come only from literal spaces (edge dots
    were folded into the gap or stripped as guards), so the head/tail-
    empty flags are UNIFORM across a part's variants — enforced here.
    Returns None (→ scan fallback) on any unsupported part, a part with
    no required fragment, or when the variant-choice product exceeds
    _MAX_GAP_COMBOS."""
    out, combos = [], 1
    for part in parts:
        if not part:
            return None
        try:
            vs = variants(part)
        except ValueError:
            return None
        if not vs or any(not any(f != "" for f in frags) for frags in vs):
            return None
        flags = {(frags[0] == "", frags[-1] == "") for frags in vs}
        if len(flags) != 1:
            return None
        combos *= len(vs)
        if combos > _MAX_GAP_COMBOS:
            return None
        out.append(vs)
    return out


def detect_gaps(pattern: str):
    """An interior unbounded-gap CHAIN `P0 .* P1 .* … Pk` (any mix of
    `.*`/`.+`/`.{m,}` with m ≤ _MAX_GAP_MIN, 1 ≤ k ≤ _MAX_GAPS after
    _fold_gap_runs), optionally
    wrapped in EDGE GUARD dot runs (what streamline() leaves of a
    `.+`/`.{m,}` edge). Parts may span MULTIPLE tokens: literal spaces
    split a part into consecutive-token fragments and in-part dots
    enumerate space/char choices (variants(); every fragment must stay
    nonempty — _gap_part_variants). Returns (parts, gap_mins,
    head_guard, tail_guard) or None.

    Exhaustive token-assignment decomposition: parts are char-ordered
    and a part's match occupies a CONTIGUOUS token range, so only
    ADJACENT parts can share (exactly) the boundary token — each of the
    2^k merge masks turns the chain into a sequence of token-slot
    GROUPS (_gap_slot_groups; a merged gap joins the two boundary
    fragments inside one term regex, where `.+` keeps its ≥1-char
    in-token meaning and across tokens `.+`/`.*` coincide — the
    inter-token space feeds the gap). A doc matches the mask iff its
    stream has group start positions a₀, a₁, … with aᵢ₊₁ ≥ aᵢ + Lᵢ
    (no token sharing beyond the merged cases), decided greedily —
    earliest feasible start per group (_gapk_docs).

    Edge-guard exactness (why _MAX_EDGE_GUARD = 4): a head guard of g
    dots requires g stream chars before the group-0 match start. A match
    at token position a has exactly a token lengths plus a spaces before
    it, so _guard_cells splits the g dots per candidate position into
    in-token dots / whole outside tokens / the ADJACENT token's length:
    for g ≤ 4 (g ≤ 3 on a boundary-exact/flush edge) every split needs
    AT MOST ONE unknown token length, which the lg cell answers via the
    anti-join against the short terms' positions (len < k terms are a
    tiny candidate set; absence in the positions plane ⇔ long).
    Symmetrically at the tail with the doc's token count and the
    group's LAST slot. The residue that still falls to the scan: g ≥ 5,
    or g = 4 on a flush edge — those splits need TWO token lengths at
    once (a multi-delta ¬(short ∧ short) union, not yet implemented)."""
    pattern = _fold_gap_runs(pattern)
    ms = list(_GAP_RX.finditer(pattern))
    if not 1 <= len(ms) <= _MAX_GAPS:
        return None
    starts = [0] + [m.end() for m in ms]
    ends = [m.start() for m in ms] + [len(pattern)]
    parts = [pattern[i:j] for i, j in zip(starts, ends)]
    head = len(parts[0]) - len(parts[0].lstrip("."))
    tail = len(parts[-1]) - len(parts[-1].rstrip("."))
    if head > _MAX_EDGE_GUARD or tail > _MAX_EDGE_GUARD:
        return None
    parts[0] = parts[0][head:]
    if tail:
        parts[-1] = parts[-1][:-tail]
    pvars = _gap_part_variants(parts)
    if pvars is None:
        return None
    mins = [_gap_min(m) for m in ms]
    # boundary-exact edges (empty edge fragments, uniform per part):
    # flush/min-m gaps resolve through margin-level starts plus, where
    # an adjacency cell needs an INTERMEDIATE token's length (`a .{2,}
    # b`: one token between, its length decides), the long-token filter
    # (_gap_cells lg — an anti-join against the SHORT terms' positions,
    # a tiny candidate set). Edge GUARDS — including on a boundary-
    # exact edge — close the same way (_guard_cells); only runs whose
    # cells would need a multi-token lookback return None → scan.
    hE = [vs[0][0] == "" for vs in pvars]
    tE = [vs[0][-1] == "" for vs in pvars]
    if any(m > _MAX_GAP_MIN for m in mins):
        return None
    if _guard_cells(head, hE[0]) is None or _guard_cells(tail, tE[-1]) is None:
        return None
    return parts, mins, head, tail


def _part_slots(frags: tuple[str, ...]):
    """(offset, term-regex, gram-run) per NONEMPTY fragment of one part
    variant — same anchoring as _slot_regexes (suffix / whole / prefix /
    lone unanchored; an empty EDGE fragment makes its real neighbor a
    middle-like anchored fragment, e.g. ('a','') → 'a$': the literal
    space after 'a' forces it to the token end). Offsets number the REAL
    tokens 0..L-1. Invariants the merge in _gap_slot_groups relies on
    (merges never happen across boundary-exact edges — detect_gaps/
    forbidden masks): the first slot of a non-head-empty part never
    starts with '^' and the last slot of a non-tail-empty part never
    ends with '$'."""
    k = len(frags) - 1
    h_empty = frags[0] == ""
    slots = []
    for j, f in enumerate(frags):
        if f == "":
            continue
        if k == 0:
            rx = f
        elif j == 0:
            rx = f + "$"
        elif j == k:
            rx = "^" + f
        else:
            rx = "^" + f + "$"
        slots.append((j - h_empty, rx, required_run_from_units(_units(f))))
    return slots


def _part_len(frags: tuple[str, ...]) -> int:
    """Real-token count of a part variant (empty edges excluded)."""
    return len(frags) - (frags[0] == "") - (frags[-1] == "")


def _gap_slot_groups(pvar, mins: list[int], mask: int):
    """Token-slot groups for one (variant-choice, merge-mask): each
    group is (slots, L, head_empty, tail_empty), slots = [(offset,
    term-regex, gram-run)] over real-token offsets 0..L-1. A merged gap
    joins the accumulated group's LAST slot to the next part's FIRST
    slot inside one term regex — `last + .*/.+ + first` is anchor-exact
    by the _part_slots invariants (the gap consumes only in-token chars
    of the shared boundary token) — and the next part's remaining slots
    shift by L-1. The merged slot's gram-run is the most selective
    constituent run (a term matching the merged regex contains a match
    of every constituent). head_empty/tail_empty carry the group's
    boundary-exact edges (first part's head, last part's tail); callers
    never set a merge bit on a gap adjacent to one. Returns (groups,
    links) — links[i] is the min-char count of the NON-MERGED gap
    connecting groups i and i+1 (the chain evaluators derive each
    boundary's cells from it plus the flush flags — _gap_cells)."""
    groups, links = [], []
    slots = list(_part_slots(pvar[0]))
    L = _part_len(pvar[0])
    hE = pvar[0][0] == ""
    tE = pvar[0][-1] == ""
    for i, mn in enumerate(mins):
        nxt = _part_slots(pvar[i + 1])
        nL = _part_len(pvar[i + 1])
        if (mask >> i) & 1:  # gap i merged: boundary token shared
            gap = ".*" if mn == 0 else ".+" if mn == 1 else f".{{{mn},}}"
            _, lrx, lrun = slots[-1]
            _, frx, frun = nxt[0]
            slots = (
                slots[:-1]
                + [(L - 1, lrx + gap + frx, max(lrun, frun, key=len))]
                + [(off + L - 1, rx, run) for off, rx, run in nxt[1:]]
            )
            L += nL - 1
        else:
            groups.append((slots, L, hE, tE))
            links.append(mn)
            slots, L, hE = list(nxt), nL, pvar[i + 1][0] == ""
        tE = pvar[i + 1][-1] == ""
    groups.append((slots, L, hE, tE))
    return groups, links


def _gap_cells(groups, links):
    """Validity cells per group boundary. A next-group start a' at
    token distance d = a' − (e + L) from a prev start e satisfies a
    min-m gap iff the chars strictly between the two matches number
    ≥ m. With t = the prev match's tail margin (chars after it inside
    its last token; 0 and unavailable when the prev group is
    tail-empty — its part consumed the boundary space) and h = the next
    match's head margin (symmetric), the char count is EXACT in
    (d, t, h) whenever no intermediate token's length enters:

      neither side flush:  d = 0 → t + 1 + h      d ≥ 1 → ≥ t+h+1+2d
      prev flush (fp):     d = 0 → h              d ≥ 1 → ≥ h+2d
      next flush (fn):     d = 0 → t              d ≥ 1 → ≥ t+2d
      both flush:          d ≥ 1 → ≥ 2d−1  (d = 0 impossible: the two
                                            consumed spaces are distinct)

    Each boundary therefore reduces to a list of cells
    (h_lvl, t_lvl, d_min, lg): a' is valid iff for SOME cell, a'
    carries a head margin ≥ h_lvl, a' ≥ frontier[t_lvl] + L + d_min,
    and — when lg > 0 — the token at slot a'−1 has length ≥ lg (the
    one INTERMEDIATE token a d_min=1 adjacency cell feeds the gap
    with; evaluated as an anti-join against the positions of terms
    SHORTER than lg, a tiny candidate set), where frontier[t] = min
    chain-valid prev start with tail margin ≥ t. Margin-k starts nest
    (k+1 ⊂ k ⊂ plain: the margin regex match contains the
    smaller-margin match at the same anchor), so greedy per-level
    minima propagation stays complete — any feasible chain's aᵢ
    dominates the matching frontier by induction. Cells close for
    every combo with m ≤ _MAX_GAP_MIN: past d = 2 (or d = 1 with
    margins) the minimum char count ≥ 3 ≥ m, so at most one token
    length ever enters."""
    out = []
    for i in range(len(groups) - 1):
        fp, fn = groups[i][3], groups[i + 1][2]
        m = links[i]
        if fp and fn:
            # d ≥ 1 (the two consumed spaces are distinct); d=1 chars =
            # len₁ exactly; d=2 ≥ 3
            cells = (
                [(0, 0, 1, 0)]
                if m <= 1
                else [(0, 0, 2, 0), (0, 0, 1, m)]
            )
        elif fp:
            # d=0: chars = h; d=1: len₁ + 1 + h; d=2: ≥ 5
            cells = (
                [(0, 0, 0, 0)]
                if m == 0
                else [(0, 0, 1, 0), (m, 0, 0, 0)]
                if m <= 2
                else [(0, 0, 2, 0), (3, 0, 0, 0), (1, 0, 1, 0), (0, 0, 1, 2)]
            )
        elif fn:
            cells = (
                [(0, 0, 0, 0)]
                if m == 0
                else [(0, 0, 1, 0), (0, m, 0, 0)]
                if m <= 2
                else [(0, 0, 2, 0), (0, 3, 0, 0), (0, 1, 1, 0), (0, 0, 1, 2)]
            )
        else:
            # d=0: chars = t + 1 + h → t + h ≥ m − 1; d≥1: ≥ 3 ≥ m
            cells = (
                [(0, 0, 0, 0)]
                if m <= 1
                else [(0, 0, 1, 0)]
                + [(h, m - 1 - h, 0, 0) for h in range(m)]
            )
        out.append(cells)
    return out


def _guard_cells(g: int, flush: bool):
    """Edge-guard validity cells (j, dist_min, lg) for a run of g guard
    dots streamline() left at the chain head (the tail mirrors with the
    SUCCESSOR count in place of the position): a start at edge distance
    `dist` (tokens strictly outside the group on that side) whose edge
    slot carries j in-token guard dots has

      non-flush:   chars outside = Σ_k (len_k + 1) + j ≥ 2·dist + j
      flush edge:  chars = Σ_k (len_k + 1) − 1 ≥ 2·dist − 1   (the part
                   consumed the boundary space; no in-token variant)

    so for g ≤ 4 (g ≤ 3 on a flush edge) at most the ONE token adjacent
    to the group ever binds — the lg field, evaluated like the gap
    cells' long-token filter (anti-join against short-term positions).
    g = 4 on a flush edge (or g ≥ 5) needs a two-token lookback →
    None → scan."""
    if g == 0:
        return [(0, 0, 0)]
    if flush:
        if g == 1:
            return [(0, 1, 0)]
        if g <= 3:
            return [(0, 2, 0), (0, 1, g)]
        return None
    if g <= 2:
        return [(g, 0, 0), (0, 1, 0)]
    if g == 3:
        return [(3, 0, 0), (0, 2, 0), (1, 1, 0), (0, 1, 2)]
    if g == 4:
        return [(4, 0, 0), (0, 2, 0), (2, 1, 0), (1, 1, 2), (0, 1, 3)]
    return None


def _gapk_docs(
    engine,
    vocab,
    ngrams,
    parts: list[str],
    mins: list[int],
    head: int = 0,
    tail: int = 0,
) -> DataFrame:
    """Evaluate a gap chain (see detect_gaps): union over (per-part
    variant choices × 2^k merge masks); each combination's group
    sequence is decided by a greedy positional chain over the
    boundary's validity cells (_gap_cells) — per-doc state carries one
    frontier per needed tail-margin level, and the doc matches iff the
    chain completes (greedy earliest extension per level is complete
    for existence of ANY valid chain — margin-k starts nest). A group's
    START positions come from anchor-joining its slots (token at a+off
    must match slot regex `off` for every slot) — each distinct slot
    regex costs one gram-pruned vocab scan + one positions decode, and
    each distinct slot SET one join tree, shared across combinations.

    Edge guards (what streamline() leaves of a `.+`/`.{m,}` edge)
    evaluate through _guard_cells — each cell splits the guard chars
    between in-token dots on the edge slot, whole outside tokens
    (position / successor-count threshold), and the length of the ONE
    adjacent token (long_at anti-join); a single group with both
    guards unions the head × tail cell product (edge_starts)."""
    from itertools import product

    pvars = _gap_part_variants(parts)
    if pvars is None:  # detect_gaps validated; defensive
        raise ValueError(f"unsupported gap parts: {parts!r}")

    def cand(rx: str, run: str):
        pruned = prune_terms_by_grams(vocab, ngrams, run)
        base = pruned if pruned is not None else vocab
        return base.filter(F.col("term").rlike(rx)).select("term_hash")

    pos_cache: dict[str, DataFrame] = {}

    def pos_of(rx: str, run: str) -> DataFrame:
        # the gram run of a guarded/merged regex is a constituent's run
        if rx not in pos_cache:
            pos_cache[rx] = engine._positions_for_hashes(
                cand(rx, run)
            ).select("doc_id", "pos")
        return pos_cache[rx]

    shortpos_cache: dict[tuple, DataFrame] = {}

    def long_at(df: DataFrame, lg: int, delta: int) -> DataFrame:
        # keep starts a whose token at slot a+delta has length ≥ lg
        # (gap cells: delta −1, the intermediate token; guard cells:
        # −1 before the group / +L after it) — anti-join against the
        # positions of the tiny set of shorter terms (the positions
        # plane lists every token slot, so absence ⇔ long)
        key = (lg, delta)
        if key not in shortpos_cache:
            c = vocab.filter(F.length("term") < lg).select("term_hash")
            shortpos_cache[key] = engine._positions_for_hashes(c).select(
                "doc_id", (F.col("pos") - delta).alias("a")
            )
        return df.join(shortpos_cache[key], ["doc_id", "a"], "left_anti")

    start_cache: dict[tuple, DataFrame] = {}

    def starts_of(slots) -> DataFrame:
        key = tuple((off, rx) for off, rx, _ in slots)
        if key not in start_cache:
            df = None
            for off, rx, run in slots:
                p = pos_of(rx, run).select(
                    "doc_id", (F.col("pos") - F.lit(off)).alias("a")
                )
                df = p if df is None else df.join(p, ["doc_id", "a"], "leftsemi")
            start_cache[key] = df
        return start_cache[key]

    def vslots(slots, hm: int, tm: int):
        # margin slot variants (levels, _gap_cells): a HEAD margin of k
        # requires ≥ k chars before the first slot's match inside its
        # token, a TAIL margin ≥ k chars after the last slot's match.
        # The _part_slots invariants guarantee the modified side is
        # unanchored (cells request h > 0 only of non-head-empty
        # groups, t > 0 only of non-tail-empty ones), so prepending/
        # appending k dots expresses the margin exactly; the gram run
        # is unchanged (a margin match contains a plain match).
        if hm:
            (o0, rx0, run0) = slots[0]
            slots = [(o0, "." * hm + rx0, run0)] + list(slots[1:])
        if tm:
            (oL, rxL, runL) = slots[-1]
            slots = list(slots[:-1]) + [(oL, rxL + "." * tm, runL)]
        return slots

    def cap_tail(df: DataFrame, L: int) -> DataFrame:
        return (
            df.join(engine._docs, "doc_id")
            .filter(F.col("a") <= F.col("dl") - 1 - L)
            .select("doc_id", "a")
        )

    def starts_c(group, hm: int = 0, tm: int = 0) -> DataFrame:
        # boundary-exact edges are REQUIRED constraints: a head-empty
        # group needs a predecessor token (a ≥ 1), a tail-empty group a
        # successor token (a + L ≤ dl − 1, the same cap the tail guard
        # uses)
        slots, L, hE, tE = group
        df = starts_of(vslots(slots, hm, tm))
        if hE:
            df = df.filter(F.col("a") >= 1)
        if tE:
            df = cap_tail(df, L)
        return df

    def edge_starts(
        group, hm: int = 0, tm: int = 0, use_head=False, use_tail=False
    ) -> DataFrame:
        """Starts of an EDGE group (chain head / tail / single) under
        the streamline guard runs: the head × tail guard-cell product
        (_guard_cells), unioned. A cell's j guard dots fold into the
        edge slot's term regex exactly like a margin level (a guard and
        a margin never target the same slot side), dist_min becomes a
        position / successor-count filter, and lg the long-adjacent-
        token anti-join."""
        slots, L, hE, tE = group
        hcells = _guard_cells(head, hE) if (use_head and head) else [(0, 0, 0)]
        tcells = _guard_cells(tail, tE) if (use_tail and tail) else [(0, 0, 0)]
        u = None
        for jh, pmin, lgh in hcells:
            for jt, smin, lgt in tcells:
                s = starts_of(vslots(slots, hm + jh, tm + jt))
                if hE or pmin:
                    s = s.filter(F.col("a") >= max(1 if hE else 0, pmin))
                if tE:
                    s = cap_tail(s, L)
                if smin:
                    s = (
                        s.join(engine._docs, "doc_id")
                        .filter(F.col("a") <= F.col("dl") - L - smin)
                        .select("doc_id", "a")
                    )
                if lgh:
                    s = long_at(s, lgh, -1)
                if lgt:
                    s = long_at(s, lgt, L)
                u = s if u is None else u.unionByName(s)
        return u

    def head_starts(group, tm: int = 0) -> DataFrame:
        return edge_starts(group, tm=tm, use_head=True)

    def tail_starts(group, hm: int = 0) -> DataFrame:
        return edge_starts(group, hm=hm, use_tail=True)

    def single_group_docs(group) -> DataFrame:
        slots, L, hE, tE = group
        if not head and not tail:
            if len(slots) == 1 and not hE and not tE:
                # docs plane suffices: no positions decode
                _, rx, run = slots[0]
                return engine._docs_for_hashes(cand(rx, run)).select(
                    "doc_id"
                )
            return starts_c(group).select("doc_id")
        return edge_starts(group, use_head=True, use_tail=True).select(
            "doc_id"
        )

    result: DataFrame | None = None
    for pvar in product(*pvars):
        # merge bits are invalid on gaps whose boundary is exact (an
        # empty edge consumes the inter-token space — the parts cannot
        # share a token)
        forbidden = 0
        for i in range(len(mins)):
            if pvar[i][-1] == "" or pvar[i + 1][0] == "":
                forbidden |= 1 << i
        for mask in range(1 << len(mins)):
            if mask & forbidden:
                continue
            groups, links = _gap_slot_groups(pvar, mins, mask)
            if len(groups) == 1:
                d = single_group_docs(groups[0])
            else:
                # greedy per-level frontier chain (_gap_cells): state
                # carries, per needed tail-margin level t, the min
                # chain-valid start with that margin (column e{t}; a
                # doc missing the level has null — its cells filter out
                # via null comparison, the other cells still union in)
                cells = _gap_cells(groups, links)
                # frontier levels group i must export = t-levels of its
                # OUTGOING boundary's cells (always include 0)
                out_lvls = [
                    sorted({0} | {t for _, t, _, _ in cells[i]})
                    for i in range(len(cells))
                ]

                def agg_min(df: DataFrame, col: str) -> DataFrame:
                    return df.groupBy("doc_id").agg(
                        F.min("a").alias(col)
                    )

                st = agg_min(head_starts(groups[0]), "e0")
                for t in out_lvls[0]:
                    if t:
                        st = st.join(
                            agg_min(head_starts(groups[0], tm=t), f"e{t}"),
                            "doc_id",
                            "left",
                        )
                d = None
                for i in range(1, len(groups)):
                    g = groups[i]
                    L = groups[i - 1][1]
                    last = i == len(groups) - 1

                    def sget(hm=0, tm=0, g=g, last=last):
                        if last:  # no outgoing gap ⇒ tm never needed
                            return tail_starts(g, hm=hm)
                        return starts_c(g, hm=hm, tm=tm)

                    def valid(tm, st=st, L=L, cc=cells[i - 1]):
                        # union of this boundary's cells, each a
                        # margin-variant start set under its frontier
                        # threshold (+ the long-intermediate-token
                        # filter where the cell carries one)
                        u = None
                        for h, t, dm, lg in cc:
                            p = sget(hm=h, tm=tm)
                            if lg:
                                p = long_at(p, lg, -1)
                            p = (
                                p.join(st, "doc_id")
                                .filter(
                                    F.col("a")
                                    >= F.col(f"e{t}") + (L + dm)
                                )
                                .select("doc_id", "a")
                            )
                            u = p if u is None else u.unionByName(p)
                        return u

                    if last:
                        d = valid(0).select("doc_id").distinct()
                    else:
                        nst = agg_min(valid(0), "e0")
                        for t in out_lvls[i]:
                            if t:
                                nst = nst.join(
                                    agg_min(valid(t), f"e{t}"),
                                    "doc_id",
                                    "left",
                                )
                        st = nst
            result = d if result is None else result.union(d)
    return result


def _dp_boundaries(units: list[tuple[str, str]]) -> list[int]:
    """Indices of boundary-candidate units: literal spaces (forced
    boundaries) and dots (space OR in-token char)."""
    return [i for i, (k, _) in enumerate(units) if k in ("space", "dot")]


def _dp_seg(units, lo_b: int | None, hi_b: int | None):
    """Unit slice strictly between boundary unit lo_b and hi_b (None =
    pattern start / end). Returns None when the slice contains a literal
    space — a fragment can never contain a forced boundary, so that
    transition is invalid."""
    lo = 0 if lo_b is None else lo_b + 1
    hi = len(units) if hi_b is None else hi_b
    seg = units[lo:hi]
    if any(k == "space" for k, _ in seg):
        return None
    return seg


def _dp_validate(pattern: str) -> list[tuple[str, str]]:
    """Validate `pattern` for the positional DP: lexes, and every
    realizable nonempty segment has a required unit (the same
    all-optional-fragment rule variants() applies — every segment here
    appears as a fragment in some dot-choice, so the rejection sets
    match). Returns the unit list."""
    units = _units(pattern)
    if not units:
        raise ValueError(f"unsupported infix pattern: {pattern!r}")
    bs: list[int | None] = [None] + _dp_boundaries(units) + [None]
    # every (earlier, later) boundary pair is a realizable segment (the
    # variant choosing exactly those two as spaces and the dots between
    # as in-token chars) — including (start, end), the no-space variant
    for ai in range(len(bs) - 1):
        for bi in range(ai + 1, len(bs)):
            seg = _dp_seg(units, bs[ai], bs[bi])
            if seg and not _has_required(seg):
                raise ValueError(
                    f"segment in {pattern!r} can match empty — unsupported"
                )
    return units


def variants(pattern: str) -> list[tuple[str, ...]]:
    """All fragment-tuples the pattern can induce on the token stream:
    every '.' independently plays a space or an in-token wildcard.
    Fragment tuples with an empty MIDDLE fragment are dropped (the stream
    never has two adjacent spaces); empty EDGE fragments survive — they
    encode 'a token boundary here' (predecessor/successor must exist).
    A NONEMPTY fragment with no required unit (all its units ?/*-
    quantified) is rejected — it could match the empty string, blurring
    the token-boundary semantics."""
    units = _units(pattern)
    if not units or pattern.count(".") > _MAX_DOTS:
        raise ValueError(f"unsupported infix pattern: {pattern!r}")
    dots = [i for i, (k, _) in enumerate(units) if k == "dot"]
    out = set()
    for mask in range(1 << len(dots)):
        kinds = [k for k, _ in units]
        for bi, i in enumerate(dots):
            if (mask >> bi) & 1:
                kinds[i] = "space"
        # split the unit list into fragments on 'space' kinds
        fragment_units: list[list[tuple[str, str]]] = [[]]
        for u, k in zip(units, kinds):
            if k == "space":
                fragment_units.append([])
            else:
                fragment_units[-1].append(u)
        frags = tuple("".join(t for _, t in fu) for fu in fragment_units)
        if any(f == "" for f in frags[1:-1]):
            continue
        for f, fu in zip(frags, fragment_units):
            if f != "" and not _has_required(fu):
                raise ValueError(
                    f"fragment {f!r} in {pattern!r} can match empty — unsupported"
                )
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


def _dp_docs(engine, pattern: str, vocab, ngrams) -> DataFrame:
    """Per-boundary positional DP — evaluates a many-wildcard pattern in
    O(b²) fragment joins instead of 2^dots variant enumeration (the
    round-3 `_MAX_DOTS` residue; reference answers the same patterns via
    its NFA walk, src/main/nfa.c:418).

    Boundary candidates = literal spaces (forced) and dots (space or
    in-token char). State S[p] = DataFrame (doc_id, t): SOME choice of
    the earlier dots matches the pattern prefix up to boundary p (chosen
    as a space), with token position t the last consumed token. A
    transition p→q extends by one whole token matching the in-token
    segment between them (dots inside play chars); the answer joins each
    state to its prefix-anchored tail. Every 2^dots variant corresponds
    to exactly one path through the chosen boundaries, so the union of
    path-endpoints equals the variant-union — same rows, polynomially
    many fragment evaluations."""
    units = _dp_validate(pattern)
    bounds = _dp_boundaries(units)
    docs_df = engine._docs

    def positions_of(seg, kind):
        f = "".join(t for _, t in seg)
        rx = {"suffix": f + "$", "whole": "^" + f + "$", "prefix": "^" + f}[
            kind
        ]
        run = required_run_from_units(seg)
        pruned = prune_terms_by_grams(
            vocab,
            ngrams,
            run,
            prefix_anchor=kind in ("whole", "prefix") and f.startswith(run),
            suffix_anchor=kind in ("whole", "suffix") and f.endswith(run),
        )
        base = pruned if pruned is not None else vocab
        cand = base.filter(F.col("term").rlike(rx)).select("term_hash")
        return engine._positions_for_hashes(cand).select("doc_id", "pos")

    results: list[DataFrame] = []

    # no-space variant: the whole pattern inside one token
    seg_all = _dp_seg(units, None, None)
    if seg_all:
        f = "".join(t for _, t in seg_all)
        run = required_run_from_units(seg_all)
        pruned = prune_terms_by_grams(vocab, ngrams, run)
        base = pruned if pruned is not None else vocab
        cand = base.filter(F.col("term").rlike(f)).select("term_hash")
        results.append(engine._docs_for_hashes(cand).select("doc_id"))

    # S[i]: state after boundary bounds[i]; None = unreachable;
    # "EMPTY" sentinel = reachable with an empty prefix (pattern starts
    # at this boundary — the fragment-tuple's empty FIRST fragment,
    # meaning only "a predecessor token exists": next match needs pos ≥ 1)
    states: list = [None] * len(bounds)
    for i, b in enumerate(bounds):
        # arrive directly from the pattern start
        seg = _dp_seg(units, None, b)
        if seg is not None:
            if not seg:
                states[i] = "EMPTY"
            else:
                states[i] = positions_of(seg, "suffix").select(
                    "doc_id", F.col("pos").alias("t")
                )
        # arrive from an earlier boundary
        for j in range(i):
            if states[j] is None:
                continue
            seg = _dp_seg(units, bounds[j], b)
            if seg is None or not seg:
                continue  # forced boundary inside, or adjacent spaces
            step = positions_of(seg, "whole")
            if states[j] == "EMPTY":
                nxt = step.filter(F.col("pos") >= 1).select(
                    "doc_id", F.col("pos").alias("t")
                )
            else:
                nxt = (
                    states[j]
                    .join(
                        step,
                        (states[j]["doc_id"] == step["doc_id"])
                        & (step["pos"] == states[j]["t"] + 1),
                    )
                    .select(step["doc_id"], F.col("pos").alias("t"))
                )
            if states[i] is None or states[i] == "EMPTY":
                # an EMPTY marker and a positional state can coexist
                # (both arrivals are realizable); keep both by unioning
                # the positional part and remembering EMPTY separately —
                # EMPTY can only occur for the first boundary at unit 0,
                # where no earlier boundary exists, so overlap is
                # impossible in practice
                states[i] = nxt
            else:
                states[i] = states[i].union(nxt)

        # finish: tail from this boundary to the pattern end
        if states[i] is None:
            continue
        tail = _dp_seg(units, b, None)
        if tail is None:
            continue
        if not tail:
            # empty LAST fragment: a successor token must exist
            if states[i] == "EMPTY":
                # pattern is a single boundary unit: any doc with ≥ 2
                # tokens has the space in its stream
                results.append(
                    docs_df.filter(F.col("dl") >= 2).select("doc_id")
                )
            else:
                results.append(
                    states[i]
                    .join(docs_df, "doc_id")
                    .filter(F.col("t") + 1 <= F.col("dl") - 1)
                    .select("doc_id")
                )
        else:
            step = positions_of(tail, "prefix")
            if states[i] == "EMPTY":
                results.append(
                    step.filter(F.col("pos") >= 1).select("doc_id")
                )
            else:
                results.append(
                    states[i]
                    .join(
                        step,
                        (states[i]["doc_id"] == step["doc_id"])
                        & (step["pos"] == states[i]["t"] + 1),
                    )
                    .select(step["doc_id"])
                )

    if not results:
        return engine.spark.createDataFrame([], "doc_id long")
    out = results[0]
    for r in results[1:]:
        out = out.union(r)
    return out


_REP_CAP = 8  # interior-rep probe ascent cap: X^9 still matching → scan


def _make_rep_probe(engine, vocab, ngrams):
    """expand()'s rep_kmax callback for the Spark plane: the largest
    k ≤ _REP_CAP with ANY doc whose stream contains k consecutive
    textual repeats of `body`, decided by index-answered emptiness
    probes of the finite pattern `(body)` × k (each probe is a
    gram-pruned vocab scan + postings semi-join — never the corpus).
    Monotone in k, so a linear ascent from max(lo,1) terminates at the
    first empty k; kmax < lo means no doc can match the quantified
    branch at all."""

    def rep_kmax(body: str, lo: int) -> int:
        grp = "(" + body + ")"

        def nonempty(k: int) -> bool:
            pats = expand(grp * k, rep_kmax=rep_kmax)
            d = _finite_docs(engine, vocab, ngrams, pats)
            return d is not None and not d.isEmpty()

        k = max(lo, 1)
        if not nonempty(k):
            return k - 1
        while k < _REP_CAP:
            if not nonempty(k + 1):
                return k
            k += 1
        raise ValueError(
            f"group repetition exceeds probe cap ({_REP_CAP}): {body!r}"
        )

    return rep_kmax


def infix_docs(engine, pattern: str) -> DataFrame:
    """Sorted distinct doc_ids whose token stream matches `pattern` —
    answered entirely from the index. See module docstring for the
    supported subset; engine.scan_docs is the raw-text fallback/oracle."""
    spark = engine.spark
    vocab = engine._vocab()
    from ..index.ngram import ensure_vocab_ngrams

    ngrams = ensure_vocab_ngrams(spark, engine.index_dir)

    pats = expand(pattern, rep_kmax=_make_rep_probe(engine, vocab, ngrams))
    result = _finite_docs(engine, vocab, ngrams, pats)
    if result is None:
        return spark.createDataFrame([], "doc_id long")
    return result.distinct().orderBy("doc_id")


def _finite_docs(engine, vocab, ngrams, pats: list[str]) -> DataFrame | None:
    """Union of doc-id sets for a list of already-expanded FINITE
    patterns (no cross-token groups, no unbounded group repetition) —
    the body shared by infix_docs and the interior-rep probes. Returns
    None for an empty union; neither distinct nor ordered."""
    # each branch is streamlined (edge gaps rewritten away); dedup
    # shared fragment-tuples so common variants across branches evaluate
    # once. Gap chains go to the positional chain evaluator; many-
    # wildcard branches (> _ENUM_DOTS dots) skip enumeration for the
    # positional DP — polynomial in dots instead of 2^dots
    all_frags: set[tuple[str, ...]] = set()
    dp_results: list[DataFrame] = []
    for p in pats:
        p = streamline(p)
        if p == "":
            # a pure edge-gap branch (`.*`): matches every doc
            dp_results.append(engine._docs.select("doc_id"))
            continue
        g = detect_gaps(p)
        if g is not None:
            dp_results.append(_gapk_docs(engine, vocab, ngrams, *g))
        elif p.count(".") > _ENUM_DOTS:
            dp_results.append(_dp_docs(engine, p, vocab, ngrams))
        else:
            all_frags.update(variants(p))

    result: DataFrame | None = None
    for d in dp_results:
        result = d if result is None else result.union(d)
    for frags in sorted(all_frags):
        k = len(frags) - 1
        slots = _slot_regexes(frags)

        if not slots:
            # pure-space variant: any doc with ≥ len(frags) tokens
            d = engine._docs.filter(F.col("dl") >= len(frags)).select("doc_id")
            result = d if result is None else result.union(d)
            continue

        # candidate term sets per slot: gram-pruned, rlike-verified
        cands = []
        for j, rx in slots:
            run = required_run_from_units(_units(frags[j]))
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
            # empty edge fragments = token-boundary requirements: the
            # predecessor token sits at stream position `anchor`, which
            # exists iff anchor >= 0 (symmetric with the trailing check
            # anchor + k <= dl - 1). A nonempty frags[0] matches as a
            # token SUFFIX at slot 0, so anchor = pos >= 0 always holds;
            # the filter is the same either way.
            hits = hits.filter(F.col("anchor") >= 0)
            if frags[-1] == "":
                hits = hits.join(engine._docs, "doc_id").filter(
                    F.col("anchor") + k <= F.col("dl") - 1
                )
            d = hits.select("doc_id")
        result = d if result is None else result.union(d)

    return result

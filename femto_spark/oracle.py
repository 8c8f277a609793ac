"""Single-process pure-Python reference engine (the differential oracle).

Mirrors the role of the reference's Perl oracle
(`/root/reference/src/test/test.pl:381-416`): an independent, trivially
auditable implementation that the distributed engine must match exactly —
same top-k doc ids, bit-equal (rounded) BM25 scores, same boolean sets,
same proximity matches with FEMTO's match-offset semantics
(`/root/reference/src/main/results.c:732-950`: offset = min(left, right)).

Intentionally naive: dict postings, python loops. Correctness only.
"""

from __future__ import annotations

from collections import defaultdict

from .scoring import bm25_term, round_score
from .tokenizer import tokenize


class OracleIndex:
    def __init__(self, docs: dict[int, str]):
        """docs: doc_id → text."""
        self.postings: dict[str, dict[int, list[int]]] = defaultdict(dict)
        self.doc_len: dict[int, int] = {}
        for doc_id in sorted(docs):
            toks = tokenize(docs[doc_id])
            self.doc_len[doc_id] = len(toks)
            for pos, t in enumerate(toks):
                self.postings[t].setdefault(doc_id, []).append(pos)
        self.n_docs = len(docs)
        self.avgdl = (
            sum(self.doc_len.values()) / self.n_docs if self.n_docs else 0.0
        )

    # -- counts (FEMTO STRING query semantics: occurrences + docs) --------
    def count(self, term: str) -> tuple[int, int]:
        """(n_occurrences, n_docs) for a single term."""
        plist = self.postings.get(term, {})
        return sum(len(v) for v in plist.values()), len(plist)

    def docs_for(self, query: str) -> set[int]:
        """AND-conjunction doc set over the query's distinct terms."""
        terms = sorted(set(tokenize(query)))
        if not terms:
            return set()
        sets = [set(self.postings.get(t, {})) for t in terms]
        out = sets[0]
        for s in sets[1:]:
            out &= s
        return out

    # -- boolean algebra (results.c:435/497/669 semantics) -----------------
    def boolean(self, op: str, left: str, right: str) -> set[int]:
        l, r = self.docs_for(left), self.docs_for(right)
        if op == "and":
            return l & r
        if op == "or":
            return l | r
        if op == "not":
            return l - r
        raise ValueError(op)

    # -- BM25 top-k --------------------------------------------------------
    def score(self, query: str, doc_id: int) -> float:
        """Deterministic: distinct terms summed in ascending order."""
        s = 0.0
        dl = self.doc_len[doc_id]
        for t in sorted(set(tokenize(query))):
            plist = self.postings.get(t)
            if plist and doc_id in plist:
                s += bm25_term(len(plist[doc_id]), dl, len(plist), self.n_docs, self.avgdl)
        return s

    def search(self, query: str, k: int = 10, mode: str = "or") -> list[tuple[int, float]]:
        """Top-k (doc_id, rounded score); ties broken by doc_id asc."""
        terms = sorted(set(tokenize(query)))
        if not terms:
            return []
        if mode == "and":
            cand = self.docs_for(query)
        else:
            cand = set()
            for t in terms:
                cand |= set(self.postings.get(t, {}))
        scored = [(d, round_score(self.score(query, d))) for d in cand]
        scored.sort(key=lambda x: (-x[1], x[0]))
        return scored[:k]

    def similar(
        self, doc_id: int, n_terms: int = 5, k: int = 10
    ) -> list[tuple[int, float]]:
        """More-like-this (femto_similar analogue): the doc's terms ranked
        by rounded tf*idf (ties → term asc), top n_terms into an OR-mode
        BM25 search — the engine.similar contract."""
        from .scoring import idf

        tf = {
            t: len(pl[doc_id])
            for t, pl in self.postings.items()
            if doc_id in pl
        }
        ranked = sorted(
            (-round_score(idf(len(self.postings[t]), self.n_docs) * tf[t]), t)
            for t in tf
        )[:n_terms]
        return self.search(" ".join(t for _, t in ranked), k=k)

    # -- proximity: THEN d / WITHIN d (results.c:732-950) -------------------
    def proximity(
        self, left: str, right: str, d: int, ordered: bool
    ) -> list[tuple[int, int]]:
        """Sorted (doc_id, offset) matches; offset = min(left, right) per the
        reference's thenResults/withinResults. Operands are tokenizer-
        normalized; multi-token operands raise (same rule as the engine)."""
        lt, rt = tokenize(left), tokenize(right)
        if len(lt) != 1 or len(rt) != 1:
            raise ValueError(
                f"THEN/WITHIN operands must be single terms: {left!r}, {right!r}"
            )
        left, right = lt[0], rt[0]
        out = []
        lp, rp = self.postings.get(left, {}), self.postings.get(right, {})
        for doc_id in sorted(set(lp) & set(rp)):
            hits = set()
            for lo in lp[doc_id]:
                for ro in rp[doc_id]:
                    delta = ro - lo
                    ok = (0 < delta <= d) if ordered else (delta != 0 and abs(delta) <= d)
                    if ok:
                        hits.add(min(lo, ro))
            out.extend((doc_id, h) for h in sorted(hits))
        return out

    # -- phrase: exact adjacent-sequence match ------------------------------
    def phrase(self, query: str) -> list[tuple[int, int, int]]:
        """Exact phrase occurrences: (doc_id, n_matches, first_pos), sorted
        by doc_id. A match at p requires term_i at p+i for all i."""
        terms = tokenize(query)
        if not terms:
            return []
        out = []
        first = self.postings.get(terms[0], {})
        for doc_id in sorted(first):
            starts = [
                p
                for p in first[doc_id]
                if all(
                    (p + i) in (self.postings.get(t, {}).get(doc_id) or [])
                    for i, t in enumerate(terms[1:], 1)
                )
            ]
            if starts:
                out.append((doc_id, len(starts), min(starts)))
        return out

    # -- approx: edit-distance term expansion (FEMTO APPROX analogue) ------
    def approx_terms(self, probe: str, max_edits: int = 1) -> list[tuple[str, int, int]]:
        """Vocabulary terms within `max_edits` of probe: (term, dist, df),
        ordered (dist asc, df desc, term asc)."""

        def _lev(a: str, b: str) -> int:
            if abs(len(a) - len(b)) > max_edits:
                return max_edits + 1
            prev = list(range(len(b) + 1))
            for i, ca in enumerate(a, 1):
                cur = [i]
                for j, cb in enumerate(b, 1):
                    cur.append(
                        min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                    )
                prev = cur
            return prev[-1]

        out = []
        for t, plist in self.postings.items():
            d = _lev(probe, t)
            if d <= max_edits:
                out.append((t, d, len(plist)))
        out.sort(key=lambda x: (x[1], -x[2], x[0]))
        return out

    def approx_docs(
        self,
        probe: str,
        max_edits: int = 1,
        subst_cost: int = 1,
        delete_cost: int = 1,
        insert_cost: int = 1,
    ) -> set[int]:
        """Docs containing any term within weighted edit distance —
        probe→term DP with the reference's per-edit costs
        (index_types.h:148-162): delete = probe char missing in the data,
        insert = extra char in the data."""

        def _wlev(a: str, b: str) -> int:
            prev = [j * insert_cost for j in range(len(b) + 1)]
            for i, ca in enumerate(a, 1):
                cur = [i * delete_cost]
                for j, cb in enumerate(b, 1):
                    cur.append(
                        min(
                            prev[j] + delete_cost,
                            cur[j - 1] + insert_cost,
                            prev[j - 1] + (0 if ca == cb else subst_cost),
                        )
                    )
                prev = cur
            return prev[-1]

        docs: set[int] = set()
        for t, plist in self.postings.items():
            if _wlev(probe, t) <= max_edits:
                docs |= set(plist)
        return docs

    # -- boolean algebra with offsets (results.c:435-496 keeps both sides) --
    def boolean_offsets(
        self, op: str, left: str, right: str
    ) -> list[tuple[int, int]]:
        """Sorted (doc_id, offset) pairs through AND/OR/NOT: AND keeps BOTH
        sides' offsets on the doc intersection, OR all offsets, NOT the
        left side's offsets on the difference — the results_t merge
        semantics with locations."""

        def occ(query: str) -> set[tuple[int, int]]:
            docs = self.docs_for(query)
            out = set()
            for t in sorted(set(tokenize(query))):
                for d, ps in self.postings.get(t, {}).items():
                    if d in docs:
                        out.update((d, p) for p in ps)
            return out

        l, r = occ(left), occ(right)
        ld, rd = {d for d, _ in l}, {d for d, _ in r}
        if op == "and":
            out = {(d, p) for d, p in l | r if d in ld and d in rd}
        elif op == "or":
            out = l | r
        elif op == "not":
            out = {(d, p) for d, p in l if d not in rd}
        else:
            raise ValueError(op)
        return sorted(out)

    # -- regex over the vocabulary (word-level REGEXP analogue) ------------
    def regex_docs(self, pattern: str) -> set[int]:
        """Docs containing any vocabulary term that matches the pattern
        (unanchored, like the reference's regexp query)."""
        import re as _re

        rx = _re.compile(pattern)
        docs: set[int] = set()
        for t, plist in self.postings.items():
            if rx.search(t):
                docs |= set(plist)
        return docs

    # -- extend: single-term right-extension stats (string_rows analogue) --
    def extend(self, prefix: str, limit: int = 10) -> list[tuple[str, int]]:
        """Terms starting with prefix, by (df desc, term asc) — the analogue
        of FEMTO's string_rows_right / femto_common BFS."""
        cands = [
            (t, len(p)) for t, p in self.postings.items() if t.startswith(prefix)
        ]
        cands.sort(key=lambda x: (-x[1], x[0]))
        return cands[:limit]

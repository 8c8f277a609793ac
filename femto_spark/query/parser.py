"""FEMTO query-grammar parser — the API-surface analogue of
`/root/reference/src/main/QUERY_FORMAT.txt:1-161` (flex/bison grammar at
`src/main/posix.flex.l` / `posix.bison.y`, AST ops `src/main/ast.h:181-199`).

Supported surface (the boolean plane of the reference grammar):

    expr    := or
    or      := and ( OR and )*
    and     := not ( AND not )*
    not     := prox ( NOT prox )*          # binary: a NOT b = a minus b
    prox    := atom ( (THEN|WITHIN) d atom )?
    atom    := '(' expr ')' | '"phrase words"' | term+   # bare terms = AND

Evaluation produces a sorted doc-id set via the engine's (or oracle's)
boolean/proximity/phrase operators — the results_t algebra
(`src/main/results.c`). Regex atoms are served by the word-level
regex_docs / scan path and APPROX by approx_docs, both exposed as
functions rather than grammar tokens (the reference's `APPROX k pattern`
prefix form maps 1:1 onto those calls).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_TOKEN_RE = re.compile(
    r"\s*(\(|\)|\"[^\"]*\"|AND\b|OR\b|NOT\b|THEN\b|WITHIN\b|[^\s()]+)"
)

_KEYWORDS = {"AND", "OR", "NOT", "THEN", "WITHIN", "(", ")"}


@dataclass
class Node:
    op: str  # 'or' | 'and' | 'not' | 'then' | 'within' | 'terms' | 'phrase'
    children: list
    dist: int | None = None
    text: str | None = None


def _lex(q: str) -> list[str]:
    out, i = [], 0
    while i < len(q):
        m = _TOKEN_RE.match(q, i)
        if not m:
            break
        out.append(m.group(1))
        i = m.end()
    return out


class _Parser:
    def __init__(self, toks: list[str]):
        self.toks = toks
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def take(self) -> str:
        t = self.toks[self.i]
        self.i += 1
        return t

    def parse(self) -> Node:
        n = self.or_()
        if self.peek() is not None:
            raise ValueError(f"trailing input at token {self.i}: {self.peek()!r}")
        return n

    def or_(self) -> Node:
        left = self.and_()
        while self.peek() == "OR":
            self.take()
            left = Node("or", [left, self.and_()])
        return left

    def and_(self) -> Node:
        left = self.not_()
        while self.peek() == "AND":
            self.take()
            left = Node("and", [left, self.not_()])
        return left

    def not_(self) -> Node:
        left = self.prox()
        while self.peek() == "NOT":
            self.take()
            left = Node("not", [left, self.prox()])
        return left

    def prox(self) -> Node:
        left = self.atom()
        if self.peek() in ("THEN", "WITHIN"):
            op = self.take().lower()
            d = self.take()
            if not d.isdigit():
                raise ValueError(f"{op.upper()} needs an integer distance, got {d!r}")
            right = self.atom()
            if left.op != "terms" or right.op != "terms":
                raise ValueError("THEN/WITHIN operate on plain terms")
            return Node(op, [left, right], dist=int(d))
        return left

    def atom(self) -> Node:
        t = self.peek()
        if t is None:
            raise ValueError("unexpected end of query")
        if t == "(":
            self.take()
            n = self.or_()
            if self.peek() != ")":
                raise ValueError("missing ')'")
            self.take()
            return n
        if t.startswith('"'):
            self.take()
            return Node("phrase", [], text=t.strip('"'))
        # greedily absorb adjacent bare terms (implicit conjunction —
        # FEMTO's concatenated-pattern form)
        words = []
        while (p := self.peek()) is not None and p not in _KEYWORDS and not p.startswith('"'):
            words.append(self.take())
        if not words:
            raise ValueError(f"unexpected token {t!r}")
        return Node("terms", [], text=" ".join(words))


def parse_query(q: str) -> Node:
    toks = _lex(q)
    if not toks:
        raise ValueError("empty query")
    return _Parser(toks).parse()


# ---------------------------------------------------------------------------
# evaluators: engine (DataFrames) and oracle (python sets)
# ---------------------------------------------------------------------------


def eval_with_engine(engine, node: Node):
    """Node → doc-id DataFrame using the engine's set operators."""
    from pyspark.sql import functions as F

    def _docs(n: Node):
        if n.op == "terms":
            return engine.docs_for(n.text)
        if n.op == "phrase":
            return engine.phrase(n.text).select("doc_id")
        if n.op in ("then", "within"):
            lt, rt = n.children[0].text, n.children[1].text
            return (
                engine.proximity(lt, rt, n.dist, ordered=(n.op == "then"))
                .select("doc_id")
                .distinct()
            )
        l, r = _docs(n.children[0]), _docs(n.children[1])
        if n.op == "and":
            return l.join(r, "doc_id", "inner").select("doc_id")
        if n.op == "or":
            return l.union(r).distinct()
        if n.op == "not":
            return l.join(r, "doc_id", "left_anti").select("doc_id")
        raise ValueError(n.op)

    return _docs(node).distinct().orderBy(F.asc("doc_id"))


def eval_with_oracle(oracle, node: Node) -> set[int]:
    """Node → doc-id set using the oracle's operators."""
    if node.op == "terms":
        return oracle.docs_for(node.text)
    if node.op == "phrase":
        return {d for d, _, _ in oracle.phrase(node.text)}
    if node.op in ("then", "within"):
        lt, rt = node.children[0].text, node.children[1].text
        return {
            d
            for d, _ in oracle.proximity(lt, rt, node.dist, ordered=(node.op == "then"))
        }
    l = eval_with_oracle(oracle, node.children[0])
    r = eval_with_oracle(oracle, node.children[1])
    return {"and": l & r, "or": l | r, "not": l - r}[node.op]

"""FEMTO query-grammar parser — the API-surface analogue of
`/root/reference/src/main/QUERY_FORMAT.txt:1-161` (flex/bison grammar at
`src/main/posix.flex.l` / `posix.bison.y`, AST ops `src/main/ast.h:181-199`).

Supported surface (the boolean plane of the reference grammar, plus its
APPROX and regex atoms, QUERY_FORMAT.txt:96-161):

    expr    := or
    or      := and ( OR and )*
    and     := not ( AND not )*
    not     := prox ( NOT prox )*          # binary: a NOT b = a minus b
    prox    := atom ( (THEN|WITHIN) d atom )?
    atom    := '(' expr ')' | '"phrase words"'
             | APPROX [k | max:sub:del:ins] word       # approximate atom
             | piece+                                  # adjacency = AND
    piece   := word with regex metachars → word-level REGEXP atom
             | plain words               → conjunction of terms

Evaluation produces a sorted doc-id set via the engine's (or oracle's)
boolean/proximity/phrase operators — the results_t algebra
(`src/main/results.c`). A bare word containing regex metacharacters (the
reference treats `. [ ] ( ) | * + ? { }` as special unless quoted,
QUERY_FORMAT.txt:20-24) becomes a REGEXP atom served by regex_docs;
`APPROX` accepts the reference's optional edit budget or
max:subst:delete:insert cost form (index_types.h:148-162) — so
`(APPROX 1 tabl) AND data` and `data ta.le` compose inside boolean
expressions.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_TOKEN_RE = re.compile(
    r"\s*(\(|\)|\"[^\"]*\"|AND\b|OR\b|NOT\b|THEN\b|WITHIN\b|APPROX\b|[^\s()]+)"
)

_KEYWORDS = {"AND", "OR", "NOT", "THEN", "WITHIN", "APPROX", "(", ")"}

# the reference's special characters (QUERY_FORMAT.txt:20-24) minus the
# grouping parens the lexer already owns — a bare word containing any of
# these is a regex atom
_REGEX_META = set(".[]*+?{}|^$")


@dataclass
class Node:
    # 'or' | 'and' | 'not' | 'then' | 'within' | 'terms' | 'phrase'
    # | 'regex' | 'approx'
    op: str
    children: list
    dist: int | None = None
    text: str | None = None
    costs: tuple[int, int, int] | None = None  # approx (subst, del, ins)


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
        if t == "APPROX":
            self.take()
            dist, costs = 1, (1, 1, 1)
            nxt = self.peek()
            if nxt is not None and (nxt.isdigit() or ":" in nxt):
                spec = self.take()
                if ":" in spec:
                    parts = spec.split(":")
                    if len(parts) != 4 or not all(p.isdigit() for p in parts):
                        raise ValueError(
                            f"APPROX cost spec must be max:subst:delete:insert, got {spec!r}"
                        )
                    dist = int(parts[0])
                    costs = (int(parts[1]), int(parts[2]), int(parts[3]))
                else:
                    dist = int(spec)
            word = self.peek()
            if word is None or word in _KEYWORDS or word.startswith('"'):
                raise ValueError("APPROX needs a pattern word")
            return Node("approx", [], text=self.take(), dist=dist, costs=costs)
        # greedily absorb adjacent bare pieces (implicit conjunction —
        # FEMTO's concatenated-pattern form); a piece with regex
        # metacharacters is a word-level REGEXP atom
        pieces: list[Node] = []
        words: list[str] = []

        def _flush():
            if words:
                pieces.append(Node("terms", [], text=" ".join(words)))
                words.clear()

        while (p := self.peek()) is not None and p not in _KEYWORDS and not p.startswith('"'):
            w = self.take()
            if set(w) & _REGEX_META:
                _flush()
                pieces.append(Node("regex", [], text=w))
            else:
                words.append(w)
        _flush()
        if not pieces:
            raise ValueError(f"unexpected token {t!r}")
        node = pieces[0]
        for nxt_piece in pieces[1:]:
            node = Node("and", [node, nxt_piece])
        return node


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
        if n.op == "regex":
            return engine.regex_docs(n.text)
        if n.op == "approx":
            s, d, i = n.costs or (1, 1, 1)
            return engine.approx_docs(
                n.text, n.dist, subst_cost=s, delete_cost=d, insert_cost=i
            )
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
    if node.op == "regex":
        return oracle.regex_docs(node.text)
    if node.op == "approx":
        s, d, i = node.costs or (1, 1, 1)
        return oracle.approx_docs(node.text, node.dist, s, d, i)
    if node.op in ("then", "within"):
        lt, rt = node.children[0].text, node.children[1].text
        return {
            d
            for d, _ in oracle.proximity(lt, rt, node.dist, ordered=(node.op == "then"))
        }
    l = eval_with_oracle(oracle, node.children[0])
    r = eval_with_oracle(oracle, node.children[1])
    return {"and": l & r, "or": l | r, "not": l - r}[node.op]

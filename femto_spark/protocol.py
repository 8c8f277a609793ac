"""Generic request protocol — the reference's string-request / JSON-response
surface (`/root/reference/src/main/femto.c:566-793` parses `string_rows*`,
`find_strings`, `docs_for_range`, `find_docs` requests;
`femto.c:918-1100` shapes the JSON responses). Every underlying function
already exists on the serving plane (LocalSearcher); this module is the
dispatcher + response shaping, so a client of the reference's generic API
can speak the same request strings to this engine.

Semantics mapping (FM-index rows → posting lists): the reference's row
ranges are suffix-array internals — `[first, last]` for a string means
"its occurrences occupy these BWT rows", and the USEFUL content is the
multiplicity (last − first + 1) plus the doc/offset resolution the other
requests perform on the range. The posting-list analogue reports the same
information with occurrence counts: a range is `[0, n_occurrences − 1]`
(empty match → `[0, -1]`, mirroring the reference's first > last
convention). Response keys (`matches`, `range`, `cost`, `match`,
`results`, `doc_info`, `offsets`, `left`/`right`) follow femto.c's
emitters verbatim.

    handler = RequestHandler(LocalSearcher(index_dir))
    handler.handle("find_strings dat[a-e]")
    → '{"matches": [{"range": [0, 162], "cost": 0, "match": "data"}]}'

`scripts/femto_serve.py --protocol` serves this loop over stdin/stdout —
the process-boundary analogue of the reference's `mod_femto` HTTP front
(any HTTP server can wrap `handle` statelessly; the searcher is the
long-lived state, exactly like the reference's femto_server_t).
"""

from __future__ import annotations

import json
import re

from .serving import LocalSearcher
from .tokenizer import tokenize

# a request pattern is "regex-shaped" if it uses any metacharacter the
# plain-token path can't serve; those go through the infix machinery
_REGEX_CHARS = set(".[]()|+*?{}")


class RequestHandler:
    """Dispatch one request string → one JSON response string.

    doc_info: doc_id → info string shown in `doc_info` fields (the
    reference stores URLs; default is the decimal doc_id)."""

    def __init__(self, searcher: LocalSearcher, doc_info=None):
        self.s = searcher
        self._doc_info = doc_info or (lambda d: str(d))

    # -- dispatcher (prefix order matters: femto.c:595-608) ---------------

    def handle(self, request: str) -> str:
        try:
            req = request.strip()
            for prefix, fn in (
                ("string_rows_left", self._rows_left),
                ("string_rows_right", self._rows_right),
                ("string_rows_all", self._rows_all),
                ("string_rows", self._rows),
                ("find_strings", self._find_strings),
                ("docs_for_range", self._docs_for_range),
                ("find_docs", self._find_docs),
            ):
                if req.startswith(prefix):
                    return json.dumps(fn(req[len(prefix) :].strip()))
            return json.dumps({"error": "Bad request"})
        except Exception as e:  # femto.c returns an error string, never dies
            return json.dumps({"error": str(e)})

    # -- string_rows*: occurrence ranges + single-char extensions ---------

    def _occ(self, term: str) -> int:
        st = self.s._term_stats([self.s._hash(term)])
        return next(iter(st.values()))[1]

    def _rows(self, arg: str) -> dict:
        toks = tokenize(arg)
        if len(toks) != 1:
            raise ValueError("string_rows takes one term")
        return {"range": [0, self._occ(toks[0]) - 1]}

    def _extensions(self, frag: str, side: str) -> list[dict]:
        """Characters extending `frag` on `side`, with occurrence counts —
        the posting-list content of the reference's per-character
        backward/forward search fan-out (femto.c string_rows_addleftright:
        one row-range per alphabet character). Vocab access is demand-
        paged: a string-range pushdown for the prefix side, a gram-pruned
        page for the suffix side — no resident term list."""
        if side == "right":
            rows = self.s._vocab_rows_prefix(frag)
            hits = [(term[len(frag)], h) for term, h in rows]
        else:
            rows = self.s._vocab_matching(
                "endswith:" + frag,
                lambda t: t.endswith(frag) and len(t) > len(frag),
                frag,
                suffix_anchor=True,
            )
            hits = [(term[-len(frag) - 1], h) for term, h in rows]
        st = self.s._term_stats([h for _, h in hits])  # one batched read
        counts: dict[str, int] = {}
        for ch, h in hits:
            counts[ch] = counts.get(ch, 0) + st[h][1]
        return [
            {"ch": c, "range": [0, n - 1]} for c, n in sorted(counts.items())
        ]

    def _rows_left(self, arg: str) -> dict:
        return {"left": self._extensions(arg, "left")}

    def _rows_right(self, arg: str) -> dict:
        return {"right": self._extensions(arg, "right")}

    def _rows_all(self, arg: str) -> dict:
        return {
            "left": self._extensions(arg, "left"),
            "right": self._extensions(arg, "right"),
        }

    # -- find_strings: matching vocabulary strings ------------------------

    def _find_strings(self, pattern: str) -> dict:
        from .index.ngram import required_literal_run

        matches = []
        if not (set(pattern) & _REGEX_CHARS):
            toks = tokenize(pattern)
            if len(toks) == 1:
                n = self._occ(toks[0])
                if n > 0:
                    matches.append(
                        {"range": [0, n - 1], "cost": 0, "match": toks[0]}
                    )
        else:
            rx = re.compile(pattern)
            run = required_literal_run(pattern)
            # demand-paged: gram-pruned vocab page (or a batch stream when
            # the run is too short) — no resident term list
            found = self.s._vocab_matching(pattern, rx.search, run)
            st = self.s._term_stats([h for _, h in found])  # one batched read
            matches = [
                {"range": [0, st[h][1] - 1], "cost": 0, "match": term}
                for term, h in found
            ]
        return {"matches": matches}

    # -- docs_for_range ----------------------------------------------------

    def _docs_for_range(self, arg: str) -> dict:
        import pyarrow.dataset as pads

        parts = arg.split()
        if len(parts) < 2:
            raise ValueError("docs_for_range takes: first last [term]")
        # INCLUSIVE [first, last] — the module's stated convention (the
        # reference's row ranges are first/last inclusive, femto.h:110-139),
        # so a client feeding back a range returned by string_rows/
        # find_strings keeps its last element. (query/engine.docs_for_range
        # is the separately-documented half-open Spark-side API.)
        lo, hi = int(parts[0]), int(parts[1])
        if len(parts) > 2:
            term = tokenize(parts[2])
            if len(term) != 1:
                raise ValueError("docs_for_range term must be one token")
            doc, _tf, _dl = self.s._decoded(self.s._hash(term[0]))
            ids = [int(d) for d in doc if lo <= d <= hi]
        else:
            t = self.s._docs_ds.to_table(
                columns=["doc_id"],
                filter=(pads.field("doc_id") >= lo) & (pads.field("doc_id") <= hi),
            )
            ids = sorted(int(d) for d in t["doc_id"].to_pylist())
        return {
            "range": [lo, hi],
            "results": [{"doc_info": self._doc_info(d)} for d in ids],
        }

    # -- find_docs ---------------------------------------------------------

    def _find_docs(self, pattern: str) -> dict:
        if set(pattern) & _REGEX_CHARS:
            # regex/infix pattern: docs only (the reference's
            # RESULT_TYPE_DOCUMENTS shape — no offsets)
            ids = self.s.infix_docs(pattern)
            return {"results": [{"doc_info": self._doc_info(d)} for d in ids]}
        toks = tokenize(pattern)
        if not toks:
            return {"results": []}
        if len(toks) == 1:
            h = self.s._hash(toks[0])
            docs, flat, off = self.s._positions(h)
            out = [
                {
                    "doc_info": self._doc_info(int(d)),
                    "offsets": [int(p) for p in flat[off[i] : off[i + 1]]],
                }
                for i, d in enumerate(docs)
            ]
            return {"results": out}
        # multi-token literal: phrase anchors are the match offsets
        out = []
        for doc, _n, _first in self.s.phrase(pattern):
            anchors = self._phrase_offsets(toks, doc)
            out.append(
                {"doc_info": self._doc_info(doc), "offsets": anchors}
            )
        return {"results": out}

    def _phrase_offsets(self, toks: list[str], doc: int) -> list[int]:
        import numpy as np

        anchors = None
        for j, t in enumerate(toks):
            docs_t, flat_t, off_t = self.s._positions(self.s._hash(t))
            i = int(np.searchsorted(docs_t, doc))
            p = flat_t[off_t[i] : off_t[i + 1]]
            a = p - j
            anchors = a if anchors is None else np.intersect1d(anchors, a)
        anchors = anchors[anchors >= 0]
        return [int(a) for a in anchors]


def serve_stdio(index_dir: str) -> None:
    """Request-per-line loop over stdin/stdout (femto.c's generic request
    API behind the thinnest possible transport)."""
    import sys

    handler = RequestHandler(LocalSearcher(index_dir))
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        sys.stdout.write(handler.handle(line) + "\n")
        sys.stdout.flush()


def make_http_server(index_dir: str, host: str = "127.0.0.1", port: int = 8080):
    """HTTP front for the request protocol — the reference's mod_femto
    shape (`src/mod_femto/mod_femto.c`: an HTTP endpoint that forwards
    request strings to the resident femto server and returns its JSON).
    POST / with the request string as the body, or GET /?q=<urlencoded
    request>; the response body is exactly what handle() emits. Requests
    are stateless; the LocalSearcher is the long-lived state (the
    femto_server_t analogue). Returns a ThreadingHTTPServer — call
    serve_forever(), or use it with port=0 in tests for an ephemeral
    port."""
    import http.server
    import threading
    import urllib.parse

    handler = RequestHandler(LocalSearcher(index_dir))
    # LocalSearcher's LRU caches (rows/positions/vocab pages) are plain
    # OrderedDicts with no internal locking; ThreadingHTTPServer would let
    # concurrent requests race an eviction against a read. Requests are
    # stateless, so one lock around handle() is sufficient and keeps the
    # searcher single-writer.
    handler_lock = threading.Lock()

    class _Handler(http.server.BaseHTTPRequestHandler):
        def _respond(self, payload: str) -> None:
            data = payload.encode("utf-8")
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_POST(self):  # noqa: N802 (stdlib naming)
            n = int(self.headers.get("Content-Length", 0) or 0)
            body = self.rfile.read(n).decode("utf-8", "replace")
            with handler_lock:
                out = handler.handle(body)
            self._respond(out)

        def do_GET(self):  # noqa: N802
            qs = urllib.parse.urlparse(self.path).query
            q = urllib.parse.parse_qs(qs).get("q", [""])[0]
            with handler_lock:
                out = handler.handle(q)
            self._respond(out)

        def log_message(self, *args):  # quiet: no per-request stderr spam
            pass

    return http.server.ThreadingHTTPServer((host, port), _Handler)


def serve_http(index_dir: str, host: str = "127.0.0.1", port: int = 8080) -> None:
    """Blocking HTTP loop (scripts/femto_serve.py --http)."""
    srv = make_http_server(index_dir, host, port)
    import sys

    print(f"# femto protocol over http://{host}:{srv.server_port}/",
          file=sys.stderr)
    srv.serve_forever()

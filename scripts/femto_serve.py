#!/usr/bin/env python
"""femto_serve — long-lived interactive search over a built index, the
serving-plane analogue of the reference's femto server
(`/root/reference/src/main/server.c`: resident process, header blocks in
memory, LRU'd data blocks). No Spark session: a pyarrow reader + the
shared codec/scoring, so warm queries answer in milliseconds.

Usage:
    python scripts/femto_serve.py INDEX_DIR --query "data table" [--k 10]
    python scripts/femto_serve.py INDEX_DIR --repl
    python scripts/femto_serve.py INDEX_DIR --bench "data table scan" --n 100
    python scripts/femto_serve.py INDEX_DIR --protocol   # femto.c generic
        # request API: string_rows* / find_strings / docs_for_range /
        # find_docs request lines on stdin -> JSON lines on stdout
    python scripts/femto_serve.py INDEX_DIR --http 8080  # same protocol
        # over HTTP (mod_femto analogue): POST / or GET /?q=<request>
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("index_dir")
    ap.add_argument("--query", help="one query, print top-k, exit")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--wand", action="store_true", help="block-max WAND path")
    ap.add_argument("--repl", action="store_true", help="interactive loop")
    ap.add_argument("--bench", help="time a query repeatedly")
    ap.add_argument("--n", type=int, default=100, help="bench repetitions")
    ap.add_argument(
        "--protocol",
        action="store_true",
        help="generic request protocol loop (femto.c JSON responses)",
    )
    ap.add_argument(
        "--http",
        type=int,
        metavar="PORT",
        help="serve the request protocol over HTTP (mod_femto analogue): "
        "POST / with the request string, or GET /?q=<request>",
    )
    ap.add_argument("--host", default="127.0.0.1")
    args = ap.parse_args()

    if args.http is not None:
        from femto_spark.protocol import serve_http

        serve_http(args.index_dir, args.host, args.http)
        return 0

    if args.protocol:
        from femto_spark.protocol import serve_stdio

        serve_stdio(args.index_dir)
        return 0

    from femto_spark.serving import LocalSearcher

    t0 = time.time()
    s = LocalSearcher(args.index_dir)
    print(f"# index open in {time.time() - t0:.3f}s "
          f"({s.n_docs} docs, avgdl {s.avgdl:.1f})", file=sys.stderr)

    def run(q: str):
        fn = s.search_wand if args.wand else s.search
        t = time.time()
        hits = fn(q, args.k)
        dt = (time.time() - t) * 1e3
        for rank, (doc, score) in enumerate(hits, 1):
            print(f"{rank:3d}  doc {doc:<10d} {score:.6f}")
        print(f"# {len(hits)} hits in {dt:.1f} ms", file=sys.stderr)

    if args.query:
        run(args.query)
        return 0
    if args.bench:
        fn = s.search_wand if args.wand else s.search
        fn(args.bench, args.k)  # warm
        t = time.time()
        for _ in range(args.n):
            fn(args.bench, args.k)
        per = (time.time() - t) / args.n * 1e3
        print(f"{args.n} runs: {per:.2f} ms/query warm")
        return 0
    if args.repl:
        print("query> ", end="", flush=True)
        for line in sys.stdin:
            q = line.strip()
            if q in ("exit", "quit", ""):
                break
            try:
                run(q)
            except Exception as e:  # keep the loop alive
                print(f"error: {e}", file=sys.stderr)
            print("query> ", end="", flush=True)
        return 0
    ap.print_help()
    return 2


if __name__ == "__main__":
    sys.exit(main())

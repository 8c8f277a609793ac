"""Generic request protocol (femto.c:566-1100): request strings in, JSON
out, answered from the serving plane; content verified against the
pure-Python oracle."""

import json

import pytest


@pytest.fixture(scope="module")
def handler(index_dir, engine):
    from femto_spark.protocol import RequestHandler
    from femto_spark.serving import LocalSearcher

    # engine fixture guarantees the gram table side effects are possible;
    # the handler itself never touches Spark
    return RequestHandler(LocalSearcher(index_dir))


def test_string_rows_range_is_occurrences(handler, oracle_sf001):
    occ, _docs = oracle_sf001.count("data")
    got = json.loads(handler.handle("string_rows data"))
    assert got == {"range": [0, occ - 1]}
    miss = json.loads(handler.handle("string_rows zzznope"))
    assert miss == {"range": [0, -1]}


def test_string_rows_extensions(handler, oracle_sf001):
    got = json.loads(handler.handle("string_rows_right dat"))
    # every vocab term starting 'dat' contributes its next char
    exp: dict = {}
    for t, plist in oracle_sf001.postings.items():
        if t.startswith("dat") and len(t) > 3:
            n = sum(len(v) for v in plist.values())
            exp[t[3]] = exp.get(t[3], 0) + n
    assert got == {
        "right": [
            {"ch": c, "range": [0, n - 1]} for c, n in sorted(exp.items())
        ]
    }
    both = json.loads(handler.handle("string_rows_all ta"))
    assert set(both) == {"left", "right"}


def test_find_strings_regex(handler, oracle_sf001):
    got = json.loads(handler.handle("find_strings s[cl]..")).get("matches")
    import re

    rx = re.compile("s[cl]..")
    exp = []
    for t in sorted(oracle_sf001.postings):
        if rx.search(t):
            n = sum(len(v) for v in oracle_sf001.postings[t].values())
            exp.append({"range": [0, n - 1], "cost": 0, "match": t})
    assert got == exp


def test_docs_for_range(handler, oracle_sf001):
    got = json.loads(handler.handle("docs_for_range 5 25"))
    assert got["range"] == [5, 25]
    ids = [r["doc_info"] for r in got["results"]]
    # protocol ranges are INCLUSIVE [first, last] (reference convention)
    assert ids == [str(d) for d in sorted(oracle_sf001.doc_len) if 5 <= d <= 25]
    got_t = json.loads(handler.handle("docs_for_range 5 25 data"))
    exp_t = [d for d in sorted(oracle_sf001.postings.get("data", {})) if 5 <= d <= 25]
    assert [r["doc_info"] for r in got_t["results"]] == [str(d) for d in exp_t]


def test_find_docs_literal_offsets(handler, oracle_sf001):
    got = json.loads(handler.handle("find_docs merge"))
    exp = {
        str(d): ps for d, ps in oracle_sf001.postings.get("merge", {}).items()
    }
    assert {r["doc_info"]: r["offsets"] for r in got["results"]} == exp


def test_find_docs_phrase_and_regex(handler, oracle_sf001, engine):
    got = json.loads(handler.handle("find_docs data table"))
    exp_docs = {d for d, _n, _f in oracle_sf001.phrase("data table")}
    assert {int(r["doc_info"]) for r in got["results"]} == exp_docs
    for r in got["results"]:
        d = int(r["doc_info"])
        dpos = set(oracle_sf001.postings["data"].get(d, []))
        tpos = set(oracle_sf001.postings["table"].get(d, []))
        assert r["offsets"] == sorted(p for p in dpos if p + 1 in tpos)
    rx = json.loads(handler.handle("find_docs erge.fas"))
    exp_rx = [r["doc_id"] for r in engine.infix_docs("erge.fas").collect()]
    assert [int(r["doc_info"]) for r in rx["results"]] == exp_rx


def test_bad_request(handler):
    assert "error" in json.loads(handler.handle("frobnicate x"))


def test_http_round_trip(index_dir, handler):
    """One real HTTP round-trip on localhost (the mod_femto analogue):
    POST body and GET ?q= must both return exactly what handle() emits."""
    import threading
    import urllib.parse
    import urllib.request

    from femto_spark.protocol import make_http_server

    srv = make_http_server(index_dir, port=0)  # ephemeral port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_port}"
        for req_str in ("string_rows data", "find_docs merge", "bogus"):
            want = json.loads(handler.handle(req_str))
            post = urllib.request.urlopen(
                urllib.request.Request(
                    base + "/", data=req_str.encode(), method="POST"
                ),
                timeout=10,
            )
            assert post.headers.get("Content-Type") == "application/json"
            assert json.loads(post.read().decode()) == want
            get = urllib.request.urlopen(
                base + "/?q=" + urllib.parse.quote(req_str), timeout=10
            )
            assert json.loads(get.read().decode()) == want
    finally:
        srv.shutdown()
        srv.server_close()

"""Oracle self-consistency + corpus generator invariants (test.pl analogue)."""

from femto_spark.corpus import extract_text, generate_pages
from femto_spark.oracle import OracleIndex
from femto_spark.scoring import bm25_term, idf
from femto_spark.tokenizer import tokenize


def test_tokenize():
    assert tokenize("Hello, WORLD-42! ") == ["hello", "world", "42"]
    assert tokenize("") == []
    assert tokenize(None) == []


def test_extractor_strips_script_style_comments_entities():
    html = (
        b"<html><head><title>T one</title><script>x='NO'</script></head>"
        b"<body><p>a &amp; b</p><!-- NO2 --><style>.c{}</style><p>end</p></body></html>"
    )
    assert extract_text(html) == "T one a & b end"


def test_generate_pages_deterministic_and_invariant():
    a = generate_pages(50, seed=42)
    b = generate_pages(50, seed=42)
    assert [r["url"] for r in a] == [r["url"] for r in b]
    assert [r["text"] for r in a] == [r["text"] for r in b]
    for r in a:
        assert r["text"] == extract_text(r["html"])  # the per-row invariant
        assert "MUST_NOT_APPEAR" not in r["text"]
    # doc_id = rank of url in sorted order
    urls = [r["url"] for r in a]
    assert urls == sorted(urls)
    assert [r["doc_id"] for r in a] == list(range(len(a)))


def test_oracle_counts_and_search():
    docs = {
        0: "the cat sat on the mat",
        1: "the dog sat",
        2: "a cat and a dog",
        3: "nothing here",
    }
    ix = OracleIndex(docs)
    assert ix.count("the") == (3, 2)
    assert ix.count("cat") == (2, 2)
    assert ix.count("zzz") == (0, 0)
    assert ix.docs_for("cat dog") == {2}
    assert ix.boolean("or", "cat", "dog") == {0, 1, 2}
    assert ix.boolean("not", "cat", "dog") == {0}
    top = ix.search("cat dog", k=10)
    assert top[0][0] == 2  # only doc with both terms
    assert all(top[i][1] >= top[i + 1][1] for i in range(len(top) - 1))
    # scores are positive and deterministic
    assert ix.search("cat dog", k=10) == top


def test_oracle_proximity_semantics():
    # FEMTO: THEN d → 0 < right-left <= d; WITHIN d → |delta| <= d;
    # reported offset = min(left, right)
    docs = {0: "a b c a", 1: "c x x a"}
    ix = OracleIndex(docs)
    assert ix.proximity("a", "c", 2, ordered=True) == [(0, 0)]  # a@0 → c@2
    within = ix.proximity("a", "c", 3, ordered=False)
    assert (1, 0) in within  # c@0, a@3 → min = 0
    assert (0, 0) in within and (0, 2) in within  # a@3,c@2 → min 2


def test_bm25_monotonicity():
    n, avgdl = 1000, 100.0
    assert idf(1, n) > idf(100, n) > 0
    assert bm25_term(5, 100, 10, n, avgdl) > bm25_term(1, 100, 10, n, avgdl)
    # longer doc → lower score at same tf
    assert bm25_term(2, 50, 10, n, avgdl) > bm25_term(2, 500, 10, n, avgdl)


def test_oracle_extend():
    docs = {0: "car cart care dog", 1: "car cart", 2: "car"}
    ix = OracleIndex(docs)
    assert ix.extend("car") == [("car", 3), ("cart", 2), ("care", 1)]

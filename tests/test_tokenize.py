import numpy as np
import pyarrow as pa

from riot_ray.config import EngineOpts
from riot_ray.tokenize import Tokenizer, split_identifier


def tok(mode="simple", stop=(), **kw):
    return Tokenizer(EngineOpts(mode=mode, stop_tokens=stop, **kw))


# ---------------------------------------------------------------------------
# space conformance mode: ForSplitData quirk
# (/root/reference/segment.go:40-77,192-208)
# ---------------------------------------------------------------------------
def test_for_split_data_hand_computed():
    t = tok("space")
    m, num, _ = t.doc_tokens_map("a b c")
    # emissions in order: a(1) a(2:prefix) b(3) ab(4) c(5) abc(6)
    assert num == 6
    assert m == {"a": [1, 2], "b": [3], "ab": [4], "c": [5], "abc": [6]}


def test_for_split_data_stop_filter():
    # stop applies to each emission independently
    t = tok("space", stop=("b", "ab"))
    m, num, _ = t.doc_tokens_map("a b c")
    assert num == 4
    assert m == {"a": [1, 2], "c": [3], "abc": [4]}


def test_for_split_data_suffix_hand_computed():
    """riot Using==6 (/root/reference/segment.go:59-70): every stepwise
    suffix-run concatenation past each non-empty element also emits.
    Go trace for [a b c]: a(1) a(2:pfx) b(3:sfx) bc(4:sfx) | b(5) ab(6:pfx)
    c(7:sfx) | c(8) abc(9:pfx)."""
    t = tok("space", suffix_combis=True)
    m, num, _ = t.doc_tokens_map("a b c")
    assert num == 9
    assert m == {"a": [1, 2], "b": [3, 5], "bc": [4], "ab": [6],
                 "c": [7, 8], "abc": [9]}


def test_for_split_data_suffix_stop_filter():
    """Stop filter applies per emission in the suffix branch too.
    Go trace for [a b c], stop={b}: a(1) a(2:pfx) [b stopped] bc(3:sfx) |
    [b stopped] ab(4:pfx) c(5:sfx) | c(6) abc(7:pfx)."""
    t = tok("space", stop=("b",), suffix_combis=True)
    m, num, _ = t.doc_tokens_map("a b c")
    assert num == 7
    assert m == {"a": [1, 2], "bc": [3], "ab": [4], "c": [5, 6], "abc": [7]}


def test_for_split_data_suffix_empty_element_reemits():
    """Faithful Go quirk: an empty later element leaves the suffix
    concatenation unchanged but the loop still emits it — including the
    empty string itself on the first step.
    Go trace for [a '' c]: a(1) a(2:pfx) ''(3:sfx) c(4:sfx) | ['' skipped]
    | c(5) ac(6:pfx)."""
    t = tok("space", suffix_combis=True)
    m, num, _ = t.doc_tokens_map("a  c")  # double space -> empty element
    assert num == 6
    assert m == {"a": [1, 2], "": [3], "c": [4, 5], "ac": [6]}


def test_chars_mode_suffix_combis():
    """Using==6 runs over the char-split path (segment.go:102-115)."""
    t = tok("chars", suffix_combis=True)
    m, num, _ = t.doc_tokens_map("xyz")
    # x(1) x(2:pfx) y(3:sfx) yz(4:sfx) | y(5) xy(6:pfx) z(7:sfx) | z(8) xyz(9:pfx)
    assert num == 9
    assert m == {"x": [1, 2], "y": [3, 5], "yz": [4], "xy": [6],
                 "z": [7, 8], "xyz": [9]}


def test_space_empty_elements_skipped():
    t = tok("space")
    m, num, _ = t.doc_tokens_map("a  b")  # double space -> empty element
    assert m["a"] == [1, 2]
    assert m["b"] == [3]
    assert m["ab"] == [4]


def test_space_lowercases():
    t = tok("space")
    m, _, _ = t.doc_tokens_map("Google Is")
    assert "google" in m and "is" in m and "googleis" in m


def test_space_query_tokens_keep_empties():
    # /root/reference/engine.go:500-510: Split on " ", no filtering
    t = tok("space")
    assert t.query_tokens("Google  Is") == ["google", "", "is"]


# ---------------------------------------------------------------------------
# simple mode (SQL-oracle-compatible)
# ---------------------------------------------------------------------------
def test_simple_tokens_and_positions():
    t = tok("simple")
    m, num, _ = t.doc_tokens_map("Foo bar, foo!")
    assert m == {"foo": [0, 9], "bar": [4]}
    assert num == 3


def test_simple_query():
    t = tok("simple")
    assert t.query_tokens("Foo, BAR!") == ["foo", "bar"]


def test_simple_batch_matches_perdoc():
    t = tok("simple")
    docs = ["Foo bar, foo!", "", "the quick Brown fox 123foo", "aaa aaa aaa"]
    parent, terms, tf, tlen = t.batch_term_counts(pa.array(docs))
    got = {}
    for p, term, f in zip(parent, terms.to_pylist(), tf):
        got.setdefault(int(p), {})[term] = int(f)
    for i, d in enumerate(docs):
        m, num, _ = t.doc_tokens_map(d)
        expect = {k: len(v) for k, v in m.items()}
        assert got.get(i, {}) == expect, f"doc {i}"
        assert int(tlen[i]) == num


# ---------------------------------------------------------------------------
# code mode
# ---------------------------------------------------------------------------
def test_split_identifier():
    assert split_identifier("parseJSON_fastPath") == [
        "parsejson_fastpath", "parse", "json", "fast", "path",
    ]
    assert split_identifier("foo") == ["foo"]
    assert split_identifier("HTTPServer2") == ["httpserver2", "http", "server", "2"]
    assert split_identifier("snake_case") == ["snake_case", "snake", "case"]


def test_code_mode_batch_matches_perdoc():
    t = tok("code")
    docs = ["def parseJSON_fastPath(x): return x", "HTTPServer2 = new HTTPServer2()"]
    parent, terms, tf, tlen = t.batch_term_counts(pa.array(docs))
    got = {}
    for p, term, f in zip(parent, terms.to_pylist(), tf):
        got.setdefault(int(p), {})[term] = int(f)
    for i, d in enumerate(docs):
        m, num, _ = t.doc_tokens_map(d)
        expect = {k: len(v) for k, v in m.items()}
        assert got.get(i, {}) == expect, f"doc {i}"
        assert int(tlen[i]) == num


def test_code_query_matches_index_side():
    t = tok("code")
    assert t.query_tokens("parseJSON_fastPath") == [
        "parsejson_fastpath", "parse", "json", "fast", "path",
    ]


# ---------------------------------------------------------------------------
# pretokenized + labels
# ---------------------------------------------------------------------------
def test_pretokenized_replaces_and_counts_entries():
    t = tok("pretokenized")
    ext = [{"text": "tok1", "locations": [0, 5]}, {"text": "tok2", "locations": [3]}]
    m, num, _ = t.doc_tokens_map("ignored content", ext_tokens=ext)
    assert m == {"tok1": [0, 5], "tok2": [3]}
    assert num == 2  # entry count, not occurrences (/root/reference/segment.go:123)


def test_labels_tf_zero_only_when_absent():
    t = tok("simple")
    m, _, _ = t.doc_tokens_map("foo bar", labels=["baz", "foo"])
    assert m["baz"] is None      # label -> tf=0 marker
    assert m["foo"] == [0]       # existing content term untouched


def test_chars_mode_hand_computed():
    # riot's char-split path: "ab" -> chars [a, b]; ForSplitData emits each
    # char AND every cumulative prefix with a running 1-based counter
    t = tok("chars")
    m, num, _ = t.doc_tokens_map("ab")
    assert m == {"a": [1, 2], "b": [3], "ab": [4]}
    assert num == 4
    m, num, _ = t.doc_tokens_map("xyz")
    assert m == {"x": [1, 2], "y": [3], "xy": [4], "z": [5], "xyz": [6]}
    assert num == 6


def test_split_identifier_distinct_subtokens():
    from riot_ray.tokenize import split_identifier

    assert split_identifier("foo_foo") == ["foo_foo", "foo"]
    assert split_identifier("FooFoo") == ["foofoo", "foo"]
    assert split_identifier("parseJson") == ["parsejson", "parse", "json"]

"""Pinyin expansion (M10) — riot's PinYin option rebuilt.

Conformance goldens come from the reference's own tests over
``text2 = "在路上, in the way"`` with GseDict=test_dict.txt:

* TestDocPinYin (/root/reference/riot_test.go:254-318): len(PinYin(text2))
  == 46; indexing two docs with PinYin=true then searching "zl" with a
  {5,10,11} allowlist finds exactly 2 docs and 1 query token.
* TestForSplitData (/root/reference/riot_test.go:320-333):
  ForSplitData(PinYin(text2)) -> 81 distinct tokens, numTokens 92.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from riot_ray.build import IndexWriter
from riot_ray.config import EngineOpts
from riot_ray.engine import LocalSearcher
from riot_ray.pinyin import PinyinExpander, lazy_convert
from riot_ray.tokenize import DictSegmenter, Tokenizer
from riot_ray.types import RankOpts, SearchReq

CN_DICT = "/root/reference/testdata/test_dict.txt"
TEXT2 = "在路上, in the way"


def _expander():
    return PinyinExpander(segmenter=DictSegmenter(CN_DICT))


def test_lazy_convert_drops_unknown():
    assert lazy_convert(TEXT2, {"在": "zai", "路": "lu", "上": "shang"}) == [
        "zai", "lu", "shang"
    ]


def test_cut_emits_all_pieces():
    # gse Cut analog: non-latin DP pieces + latin runs + whitespace runs
    assert DictSegmenter(CN_DICT).cut(TEXT2) == [
        "在", "路", "上", ",", " ", "in", " ", "the", " ", "way"
    ]


def test_expand_reference_golden_46():
    arr = _expander().expand(TEXT2)
    assert len(arr) == 46  # riot_test.go:264 tt.Expect(t, "46", ...)
    # spot the structure: char prefixes, segments, syllable + abbr prefixes
    assert arr[0:2] == ["在", "在"]
    assert "在路上" in arr
    for t in ("zai", "zailu", "zailushang", "z", "zl", "zls"):
        assert t in arr


def test_expand_stop_filter():
    ex = PinyinExpander(segmenter=DictSegmenter(CN_DICT), stop={"在", "z"})
    arr = ex.expand(TEXT2)
    assert "在" not in arr and "z" not in arr
    # prefixes containing the stopped char still emit (riot checks each
    # emission independently)
    assert "在路" in arr and "zl" in arr


def test_for_split_data_pinyin_goldens():
    """riot_test.go:329-332: 81 distinct tokens, numTokens 92."""
    arr = _expander().expand(TEXT2)
    tok = Tokenizer(EngineOpts(mode="space"))
    tokens_map, num = tok._for_split_data(arr)
    assert len(tokens_map) == 81
    assert num == 92


def test_merge_overwrites_locations():
    ex = _expander()
    tm = {"zl": [5, 9], "other": [1]}
    n = ex.merge_into(tm, TEXT2)
    assert n == 46
    assert tm["zl"] == [ex.expand(TEXT2).index("zl")]
    assert tm["other"] == [1]  # untouched: not in the expansion


@pytest.fixture(scope="module")
def py_engine(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pinyin")
    rows = [("5", "unrelated latin text"), ("10", TEXT2), ("11", TEXT2)]
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.string()),
            "content": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    src = os.path.join(str(tmp), "docs.parquet")
    pq.write_table(table, src)
    opts = EngineOpts(
        mode="dict",
        dict_path=CN_DICT,
        pinyin=True,
        id_cols=("doc_id",),
        content_col="content",
        meta_cols=(),
        num_parts=2,
        num_shards=2,
    )
    idx = os.path.join(str(tmp), "index")
    IndexWriter(idx, opts).build(src)
    return LocalSearcher(idx)


def test_doc_pinyin_search_zl(py_engine):
    """TestDocPinYin search path: 'zl' with allowlist {5,10,11} -> 2 docs,
    1 token (riot_test.go:290-297)."""
    resp = py_engine.search(
        SearchReq(
            text="zl",
            doc_ids={"5", "10", "11"},
            rank_opts=RankOpts(max_outputs=10),
        )
    )
    assert len(resp.tokens) == 1
    assert sorted(h.doc_id for h in resp.docs) == ["10", "11"]
    assert resp.num_docs == 2


def test_pinyin_abbreviation_and_syllables_indexed(py_engine):
    for q in ("zls", "zailushang", "zai"):
        resp = py_engine.search(
            SearchReq(text=q, rank_opts=RankOpts(max_outputs=10))
        )
        assert sorted(h.doc_id for h in resp.docs) == ["10", "11"], q
    # doc 5 has none of the pinyin tokens
    resp = py_engine.search(
        SearchReq(text="unrelated", rank_opts=RankOpts(max_outputs=10))
    )
    assert sorted(h.doc_id for h in resp.docs) == ["5"]

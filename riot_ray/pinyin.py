"""Pinyin expansion (riot's ``PinYin`` option, M10).

Rebuild of ``Engine.PinYin`` (/root/reference/segment.go:316-378, non-phrase
path) and the index-side merge (/root/reference/segment.go:231-241): for a
document's content the engine emits, in order,

1. every single character (rune) that is not a stop token, interleaved with
   every cumulative character prefix of the content so far,
2. the dictionary segmentation of the content (gse ``Cut`` analog —
   :meth:`riot_ray.tokenize.DictSegmenter.cut`), stop-filtered,
3. every cumulative concatenation prefix of the pinyin syllables
   (``gpy.LazyConvert`` analog), stop-filtered, interleaved with
4. every cumulative first-letter prefix of those syllables (the
   "Chinese alphabet abbreviation": 在路上 -> z, zl, zls), stop-filtered.

The syllable table is DATA, not code: riot links go-ego/gpy's embedded
Unicode-Han -> Mandarin table.  That table is not available offline, so the
expander takes a user-supplied ``char pinyin`` mapping file (one pair per
line, ``//`` comments) or an inline dict; :data:`DEMO_MAPPING` ships a tiny
demonstration subset (public Unihan kMandarin readings) sufficient for the
reference's own test corpus.  Characters absent from the mapping are skipped,
matching ``gpy.LazyConvert`` which only yields readings for Han characters it
knows.
"""

from __future__ import annotations

# Demonstration subset of Unihan kMandarin readings (toneless).  Real
# deployments pass mapping_path= with a full table.
DEMO_MAPPING = {
    "在": "zai", "路": "lu", "上": "shang",
    "你": "ni", "好": "hao", "世": "shi", "界": "jie",
    "中": "zhong", "国": "guo", "有": "you", "人": "ren",
    "万": "wan", "里": "li", "长": "chang", "城": "cheng",
    "是": "shi", "不": "bu", "我": "wo", "的": "de", "了": "le",
    "天": "tian", "地": "di", "行": "xing", "走": "zou",
}


def load_pinyin_dict(path: str) -> dict[str, str]:
    """``char pinyin`` per line; ``//`` comments and blanks skipped."""
    out: dict[str, str] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("//"):
                continue
            parts = line.split()
            if len(parts) >= 2:
                out[parts[0]] = parts[1].lower()
    return out


def lazy_convert(hans: str, mapping: dict[str, str]) -> list[str]:
    """gpy.LazyConvert analog: the pinyin reading of each known Han
    character, in order; unknown / non-Han characters are dropped."""
    return [mapping[ch] for ch in hans if ch in mapping]


class PinyinExpander:
    """Stateful expansion (mapping + segmenter dict load once per actor, T1).

    ``segmenter`` is a :class:`riot_ray.tokenize.DictSegmenter` (or None to
    mirror riot's ``NotUseGse`` path, which skips step 2).
    """

    def __init__(self, mapping: dict[str, str] | None = None,
                 mapping_path: str | None = None,
                 stop=frozenset(), segmenter=None):
        m = dict(DEMO_MAPPING if mapping is None and mapping_path is None else {})
        if mapping_path:
            m.update(load_pinyin_dict(mapping_path))
        if mapping:
            m.update(mapping)
        self.mapping = m
        self.stop = frozenset(stop)
        self.segmenter = segmenter

    def expand(self, hans: str) -> list[str]:
        """The ordered expansion array (duplicates kept — riot appends to a
        slice; the tokens map dedups later)."""
        out: list[str] = []
        stop = self.stop
        # 1. chars + cumulative char prefixes (segment.go:334-347)
        prefix = ""
        for ch in hans:
            if ch not in stop:
                out.append(ch)
            prefix += ch
            if prefix not in stop:
                out.append(prefix)
        # 2. dictionary segmentation, gse Cut analog (segment.go:349-357 via
        # engine.go:479-497)
        if self.segmenter is not None:
            for tok in self.segmenter.cut(hans):
                if tok not in stop:
                    out.append(tok)
        # 3+4. syllable prefixes and first-letter prefixes, interleaved
        # (segment.go:359-375)
        py = lazy_convert(hans, self.mapping)
        py_str = ""
        abbr = ""
        for syl in py:
            py_str += syl
            if py_str not in stop:
                out.append(py_str)
            if syl:
                abbr += syl[0]
                if abbr not in stop:
                    out.append(abbr)
        return out

    def merge_into(self, tokens_map: dict, hans: str) -> int:
        """Index-side merge (/root/reference/segment.go:231-241): each
        expansion token OVERWRITES any existing locations with ``[i]`` (its
        position in the expansion array); returns the count added to
        numTokens."""
        arr = self.expand(hans)
        stop = self.stop
        for i, s in enumerate(arr):
            if s not in stop:
                tokens_map[s] = [i]
        return len(arr)

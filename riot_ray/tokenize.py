"""Tokenizers.

Four modes (EngineOpts.mode):

* ``simple`` — lowercase, split on ``[^a-z0-9]+``, drop empties, stop-filter.
  Deliberately equal to DuckDB's
  ``unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+'))`` so every
  downstream aggregate is SQL-oracle checkable.
* ``code`` — identifier-aware mode for source code (flagship): extract
  ``[A-Za-z0-9_]+`` runs from the *original* text, emit the lowercased whole
  identifier plus its snake_case / camelCase sub-tokens.  Sub-token expansion
  is memoized per actor (source vocab repeats heavily).
* ``space`` — reference conformance mode replicating riot Using=4/NotUseGse:
  ``strings.Split(ToLower(content), " ")`` then the ForSplitData
  cumulative-prefix quirk (/root/reference/segment.go:40-77,192-208):
  positions are a running 1-based token counter, NOT byte offsets, and every
  prefix-concatenation of the split elements is also emitted as a term.
* ``pretokenized`` — tokens column passthrough
  (/root/reference/segment.go:117-125): external tokens REPLACE content
  tokens of the same text, numTokens counts token ENTRIES (not occurrences,
  /root/reference/segment.go:123 quirk).

Labels (/root/reference/segment.go:264-279): emitted as tf=0, position-less
postings only when the term is not already present; they participate in AND
lookup but contribute 0 to BM25.

The freq-mode simple/code batch path is fully vectorized (pyarrow.compute
split + numpy unique over packed (doc,term-code) keys); positions (locs
mode) and the space conformance mode run per-doc Python, used only for
conformance fixtures and proximity features.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .config import LOCS_INDEX, EngineOpts

_SIMPLE_RE = re.compile(r"[^a-z0-9]+")
_IDENT_RE = re.compile(r"[A-Za-z0-9_]+")
# camelCase boundaries: lower->Upper, acronym->TitleCase, letter<->digit
_CAMEL_RE = re.compile(
    r"(?<=[a-z0-9])(?=[A-Z])|(?<=[A-Z])(?=[A-Z][a-z])|(?<=[A-Za-z])(?=[0-9])|(?<=[0-9])(?=[A-Za-z])"
)


def phrase_pattern(tokens: list, mode: str) -> str:
    """RE2 pattern (applied to lowercased content) that holds iff ``tokens``
    appear consecutively in the token stream of ``mode``.  Exactness depends
    on every maximal token being one text run: in simple mode any alnum run
    is a token, so "only separators between occurrences" == "adjacent in the
    token stream"; in space mode tokens are the single-space split fields.
    Other modes (code identifier expansion, dict segmentation) have
    zero-width intra-token boundaries, where no text regex can express
    adjacency — rejected explicitly."""
    if mode == "simple":
        sep, left, right = "[^a-z0-9]+", "(?:^|[^a-z0-9])", "(?:[^a-z0-9]|$)"
    elif mode == "space":
        sep, left, right = " ", "(?:^| )", "(?: |$)"
    else:
        raise ValueError(
            f"phrase search supports modes 'simple' and 'space', not {mode!r}"
        )
    return left + sep.join(re.escape(t) for t in tokens) + right


def split_identifier(ident: str) -> list[str]:
    """Expansion list for one identifier in ``code`` mode: lowercased whole
    identifier first, then distinct lowercased sub-tokens when splitting on
    '_' and camel boundaries yields more than one part."""
    whole = ident.lower()
    out = [whole]
    seen = {whole}
    parts = []
    for chunk in ident.split("_"):
        if chunk:
            parts.extend(_CAMEL_RE.split(chunk))
    if len(parts) > 1:
        for p in parts:
            lp = p.lower()
            if lp not in seen:
                seen.add(lp)
                out.append(lp)
    return out


class DictSegmenter:
    """Dictionary-driven segmenter for ``mode="dict"`` — the rebuild of
    riot's gse path (M2: /root/reference/segment.go:128-169 calls gse's
    ModeSegment; dict load at /root/reference/engine.go:292-301).

    Fresh implementation of the PUBLISHED max-probability unigram
    segmentation algorithm (the sego/gse/jieba family): over each non-latin
    run, dynamic programming picks the split minimizing
    ``sum(log2(total_freq / freq(word)))`` — i.e. maximizing the product of
    word frequencies; unknown single characters get frequency 1.  Latin or
    digit runs are atomic tokens (emitted lowercased, like gse's alpha
    handling); whitespace is a boundary and never emitted; every other
    character participates in the DP (punctuation falls out as unknown
    singles, which riot also indexes when no stop file is set).

    Dictionary format = gse's: ``word freq [pos]`` per line, ``//`` comments
    skipped.  Positions are BYTE offsets into the original content (gse's
    ``segment.Start()``), token text is lowercased.

    State (dict + cost table) loads once per actor (T1); segmentation is
    per-doc Python — a conformance/feature mode, not the vectorized
    simple/code hot path."""

    _LATIN = re.compile(r"[A-Za-z0-9]+")

    def __init__(self, dict_path: str | None = None, dict_entries=None):
        import math

        freq: dict[str, float] = {}
        if dict_path:
            with open(dict_path, encoding="utf-8") as f:
                for line in f:
                    line = line.strip()
                    if not line or line.startswith("//"):
                        continue
                    parts = line.split()
                    if not parts:
                        continue
                    try:
                        freq[parts[0]] = float(parts[1]) if len(parts) > 1 else 1.0
                    except ValueError:
                        freq[parts[0]] = 1.0
        for entry in dict_entries or ():
            word, f_ = (entry[0], float(entry[1])) if len(entry) > 1 else (entry[0], 1.0)
            freq[word] = f_
        self.total = max(sum(freq.values()), 1.0)
        self.max_len = max((len(w) for w in freq), default=1)
        self.cost = {w: math.log2(self.total / f) for w, f in freq.items() if f > 0}
        self.unk_cost = math.log2(self.total)  # unknown char: freq 1

    def _dp_run(self, run: str):
        """Min-cost split of one non-latin run; ties prefer the LONGER word
        (maximal match) for determinism.  Returns token list."""
        m = len(run)
        best = [0.0] + [float("inf")] * m
        back = [0] * (m + 1)
        for i in range(m):
            if best[i] == float("inf"):
                continue
            hi = min(self.max_len, m - i)
            # unknown single char is always a candidate
            for L in range(1, hi + 1):
                w = run[i: i + L]
                c = self.cost.get(w)
                if c is None:
                    if L > 1:
                        continue
                    c = self.unk_cost
                cand = best[i] + c
                j = i + L
                # strictly-less OR equal-with-longer-word wins
                if cand < best[j] or (cand == best[j] and (j - back[j]) < L):
                    best[j] = cand
                    back[j] = i
        out = []
        j = m
        while j > 0:
            i = back[j]
            out.append(run[i:j])
            j = i
        out.reverse()
        return out

    def cut(self, text: str) -> list[str]:
        """gse ``Cut`` analog (used by Engine.Segment,
        /root/reference/engine.go:479-497, and PinYin): like :meth:`segment`
        but ALSO emits whitespace runs as tokens and preserves case — gse's
        Cut returns every piece of the input, segmentation applied to the
        non-latin runs."""
        out: list[str] = []
        i = 0
        n = len(text)
        while i < n:
            ch = text[i]
            if ch.isspace():
                j = i
                while j < n and text[j].isspace():
                    j += 1
                out.append(text[i:j])
                i = j
                continue
            m = self._LATIN.match(text, i)
            if m:
                out.append(m.group())
                i = m.end()
                continue
            j = i
            while j < n and not text[j].isspace() and not self._LATIN.match(text, j):
                j += 1
            out.extend(self._dp_run(text[i:j]))
            i = j
        return out

    def segment(self, text: str) -> list[tuple[str, int]]:
        """(token_text_lowercased, byte_start) for every segment of text."""
        out: list[tuple[str, int]] = []
        i = 0
        n = len(text)
        byte_of = [0] * (n + 1)
        for k, ch in enumerate(text):
            byte_of[k + 1] = byte_of[k] + len(ch.encode("utf-8"))
        while i < n:
            ch = text[i]
            if ch.isspace():
                i += 1
                continue
            m = self._LATIN.match(text, i)
            if m:
                out.append((m.group().lower(), byte_of[i]))
                i = m.end()
                continue
            # non-latin run: up to the next whitespace/latin boundary
            j = i
            while j < n and not text[j].isspace() and not self._LATIN.match(text, j):
                j += 1
            pos = i
            for tok in self._dp_run(text[i:j]):
                out.append((tok.lower(), byte_of[pos]))
                pos += len(tok)
            i = j
        return out


class Tokenizer:
    """Stateful tokenizer: compiled patterns + stop set + expansion cache.

    Used directly (driver/query side) and as the state of the actor-pool
    tokenize stage (state loaded once per actor — SURVEY.md §2.3 T1).
    """

    def __init__(self, opts: EngineOpts):
        self.opts = opts
        self.stop = frozenset(opts.stop_tokens)
        self._exp_cache: dict[str, list[str]] = {}
        self.segmenter = None
        if opts.mode == "dict":
            self.segmenter = DictSegmenter(opts.dict_path, opts.dict_entries)
        self.pinyin = None
        if getattr(opts, "pinyin", False):
            from .pinyin import PinyinExpander

            self.pinyin = PinyinExpander(
                mapping_path=opts.pinyin_dict, stop=self.stop,
                segmenter=self.segmenter,
            )

    # ------------------------------------------------------------------ #
    # query side
    # ------------------------------------------------------------------ #
    def query_tokens(self, text: str, stop_filter: bool = True) -> list[str]:
        """Tokenize query text with semantics matching the index side.

        space mode replicates /root/reference/engine.go:500-510 exactly:
        lowercase + split on single space, empties KEPT, no stop filter
        (an empty or stopped token then misses the index and empties the
        AND result — riot behaves the same way).

        ``stop_filter=False`` keeps stop words in the stream — used by
        phrase search, where the adjacency regex must reflect the user's
        LITERAL phrase (a silently dropped stop word would demand the
        surrounding words be directly adjacent in text)."""
        if text == "":
            return []
        stop = self.stop if stop_filter else frozenset()
        mode = self.opts.mode
        if mode in ("space", "chars"):
            return text.lower().split(" ")
        if mode == "dict":
            # /root/reference/engine.go:500-510: ToLower then gse Segment,
            # stop filter applied per token
            return [
                t for t, _ in self.segmenter.segment(text.lower())
                if t not in stop
            ]
        if mode == "simple":
            return [t for t in _SIMPLE_RE.split(text.lower()) if t and t not in stop]
        if mode == "code":
            out = []
            for ident in _IDENT_RE.findall(text):
                for t in self._expand(ident):
                    if t not in stop:
                        out.append(t)
            return out
        # pretokenized: query text splits like simple
        return [t for t in _SIMPLE_RE.split(text.lower()) if t and t not in stop]

    def query_tokens_both(self, text: str) -> tuple[list[str], list[str]]:
        """(stop-filtered, unfiltered) query tokens from ONE segmentation
        pass — phrase search needs both (filtered for postings pruning,
        unfiltered for the literal-adjacency regex) and segmenting twice
        doubled the hot-path cost.  Every mode's stop handling is a plain
        per-token exclusion applied AFTER segmentation (space/chars never
        apply it), so the filtered list derives from the raw stream."""
        raw = self.query_tokens(text, stop_filter=False)
        if self.opts.mode in ("space", "chars") or not self.stop:
            return raw, raw
        return [t for t in raw if t not in self.stop], raw

    def _expand(self, ident: str) -> list[str]:
        e = self._exp_cache.get(ident)
        if e is None:
            e = split_identifier(ident)
            if len(self._exp_cache) < 2_000_000:
                self._exp_cache[ident] = e
        return e

    # ------------------------------------------------------------------ #
    # index side, per-doc (conformance / locs paths)
    # ------------------------------------------------------------------ #
    def doc_tokens_map(self, content: str, ext_tokens=None, labels=None):
        """One document -> (tokens_map {term: [positions]}, num_tokens,
        freq_override {term: tf}).

        Mirrors makeTokensMap behaviour (/root/reference/segment.go:210-246)
        for the supported modes.  ``freq_override`` carries explicit
        KeywordIndex.Frequency values from pretokenized input (riot's
        FrequenciesIndex reads the Frequency field, not len(locations) —
        /root/reference/core/indexer.go:222-231)."""
        mode = self.opts.mode
        tokens_map: dict[str, list[int]] = {}
        num_tokens = 0
        freq_override: dict[str, float] = {}

        if mode == "space":
            if content:
                tokens_map, num_tokens = self._for_split_data(
                    content.lower().split(" "),
                    suffix=self.opts.suffix_combis,
                )
        elif mode == "chars":
            # riot's non-gse char path (/root/reference/segment.go:105-110):
            # split into single characters, then the ForSplitData quirk
            if content:
                tokens_map, num_tokens = self._for_split_data(
                    list(content.lower()),
                    suffix=self.opts.suffix_combis,
                )
        elif mode == "dict":
            # Using=1 semantics (/root/reference/segment.go:128-169): segment
            # content, append byte positions per occurrence, stop-filter the
            # tokensMap; numTokens counts ALL segments (pre-filter)
            if content:
                segs = self.segmenter.segment(content)
                num_tokens = len(segs)
                for t, pos in segs:
                    if t not in self.stop:
                        tokens_map.setdefault(t, []).append(pos)
        elif mode in ("simple", "code"):
            if content:
                tokens_map, num_tokens = self._regex_tokens(content)
        # pretokenized: content ignored unless mode says otherwise

        if ext_tokens is not None:
            # replacement, not append: /root/reference/segment.go:117-121
            for t in ext_tokens:
                text = t["text"]
                if text not in self.stop:
                    tokens_map[text] = list(t.get("locations") or [])
                    if t.get("frequency") is not None:
                        freq_override[text] = float(t["frequency"])
            # numTokens counts entries: /root/reference/segment.go:123
            num_tokens += len(ext_tokens)

        if self.pinyin is not None:
            # /root/reference/segment.go:231-241: expansion runs AFTER the
            # content/external merge; each token overwrites locations with
            # its expansion-array position; numTokens += full count
            num_tokens += self.pinyin.merge_into(tokens_map, content or "")

        if labels:
            # /root/reference/segment.go:264-279: only when absent
            for label in labels:
                if label not in self.stop and label not in tokens_map:
                    tokens_map[label] = None  # tf=0, no positions
        return tokens_map, num_tokens, freq_override

    def _for_split_data(self, elems: list[str], suffix: bool = False):
        """riot ForSplitData quirk (/root/reference/segment.go:40-77):
        emits each non-empty element AND the cumulative concatenation of all
        elements so far; positions are the running (1-based) emission counter;
        stop filter applies to each emission independently.

        ``suffix=True`` is riot's Using==6 branch (segment.go:59-70): after
        each non-empty element, ALSO emit every stepwise concatenation of
        the elements past it — including the re-emission of an unchanged
        string when a later element is empty (the Go loop appends
        unconditionally), faithfully replicated."""
        tokens_map: dict[str, list[int]] = {}
        num = 0
        prefix = ""
        for i, el in enumerate(elems):
            if el == "":
                continue
            if el not in self.stop:
                num += 1
                tokens_map.setdefault(el, []).append(num)
            prefix += el
            if prefix not in self.stop:
                num += 1
                tokens_map.setdefault(prefix, []).append(num)
            if suffix:
                ss = ""
                for s in range(i + 1, len(elems)):
                    ss += elems[s]
                    if ss not in self.stop:
                        num += 1
                        tokens_map.setdefault(ss, []).append(num)
        return tokens_map, num

    def _regex_tokens(self, content: str):
        """simple/code per-doc path with byte positions (locs mode)."""
        tokens_map: dict[str, list[int]] = {}
        num = 0
        if self.opts.mode == "simple":
            lowered = content.lower()
            # finditer over the complement pattern: scan tokens directly
            for m in re.finditer(r"[a-z0-9]+", lowered):
                t = m.group()
                if t in self.stop:
                    continue
                num += 1
                tokens_map.setdefault(t, []).append(m.start())
        else:  # code
            for m in _IDENT_RE.finditer(content):
                for t in self._expand(m.group()):
                    if t in self.stop:
                        continue
                    num += 1
                    tokens_map.setdefault(t, []).append(m.start())
        return tokens_map, num

    # ------------------------------------------------------------------ #
    # index side, vectorized batch (freq mode hot path)
    # ------------------------------------------------------------------ #
    def batch_term_counts(self, contents: pa.Array):
        """Vectorized (doc_idx, term, tf) + token_len for a batch of contents.

        Returns (parent_idx:int64[], terms:pa.StringArray, tf:int64[],
        token_len:int64[ndocs]).  No Python loop over rows; the only Python
        loop in code mode is over *unique* identifiers (memoized)."""
        n_docs = len(contents)
        if self.opts.mode == "code":
            flat, parents = self._flatten(contents, r"[^A-Za-z0-9_]+", lower=False)
            flat, parents = self._expand_flat(flat, parents)
        else:  # simple
            flat, parents = self._flatten(contents, r"[^a-z0-9]+", lower=True)

        if self.stop:
            keep = np.invert(
                pc.is_in(flat, value_set=pa.array(sorted(self.stop))).to_numpy(
                    zero_copy_only=False
                )
            )
            flat = flat.filter(pa.array(keep))
            parents = parents[keep]

        token_len = np.bincount(parents, minlength=n_docs).astype(np.int64)

        # (doc, term-code) -> counts via one sort-based unique
        dict_arr = pc.dictionary_encode(flat)
        if isinstance(dict_arr, pa.ChunkedArray):
            dict_arr = dict_arr.combine_chunks()
        codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.uint64)
        vocab = dict_arr.dictionary
        keys = (parents.astype(np.uint64) << np.uint64(32)) | codes
        uniq, counts = np.unique(keys, return_counts=True)
        out_parent = (uniq >> np.uint64(32)).astype(np.int64)
        out_code = (uniq & np.uint64(0xFFFFFFFF)).astype(np.int64)
        out_terms = vocab.take(pa.array(out_code))
        return out_parent, out_terms, counts.astype(np.int64), token_len

    def _flatten(self, contents: pa.Array, split_pattern: str, lower: bool):
        arr = contents
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if lower:
            arr = pc.utf8_lower(arr)
        lists = pc.split_pattern_regex(arr, split_pattern)
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = pc.list_flatten(lists)
        parents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        # nulls in content -> no tokens
        keep = np.asarray(keep, dtype=bool)
        flat = flat.filter(pa.array(keep))
        parents = parents[keep]
        return flat, parents

    def _expand_flat(self, flat: pa.Array, parents: np.ndarray):
        """code mode: replace each identifier occurrence with its expansion
        (whole + sub-tokens), vectorized over unique identifiers."""
        dict_arr = pc.dictionary_encode(flat)
        if isinstance(dict_arr, pa.ChunkedArray):
            dict_arr = dict_arr.combine_chunks()
        codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniques = dict_arr.dictionary.to_pylist()
        exp_terms: list[str] = []
        exp_len = np.empty(len(uniques), dtype=np.int64)
        exp_start = np.empty(len(uniques), dtype=np.int64)
        for i, u in enumerate(uniques):
            e = self._expand(u)
            exp_start[i] = len(exp_terms)
            exp_len[i] = len(e)
            exp_terms.extend(e)
        lens = exp_len[codes]
        total = int(lens.sum())
        out_parents = np.repeat(parents, lens)
        starts = np.repeat(exp_start[codes], lens)
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(lens) - lens, lens
        )
        idx = starts + within
        exp_arr = pa.array(exp_terms, type=pa.string())
        out_flat = exp_arr.take(pa.array(idx))
        return out_flat, out_parents


def tokens_map_to_rows(tokens_map: dict, with_positions: bool, freq_override=None):
    """Materialize one doc's tokens_map into parallel lists
    (terms, tfs, positions) — tf = len(positions) unless an explicit
    Frequency was provided, labels tf=0
    (/root/reference/segment.go:281-297)."""
    terms, tfs, poss = [], [], []
    for term, locs in tokens_map.items():
        terms.append(term)
        if locs is None:
            tfs.append(0.0)
            poss.append([])
        else:
            if freq_override and term in freq_override:
                tfs.append(freq_override[term])
            else:
                tfs.append(float(len(locs)))
            poss.append(list(locs) if with_positions else [])
    return terms, tfs, poss


def needs_positions(opts: EngineOpts) -> bool:
    return opts.index_type == LOCS_INDEX

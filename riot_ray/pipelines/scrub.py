"""PII scrubbing and text normalization — map-only cleaning stages.

The standard web-corpus cleanup steps every large-scale training-data
pipeline runs before anything else (C4, Raffel et al. 2020; Dolma,
Soldaini et al. 2024 both redact emails / IP addresses / phone numbers
with regex passes):

* :func:`pii_scrub` — count and redact emails, IPv4 addresses and
  international phone numbers.
* :func:`normalize_text` — Unicode NFC + whitespace collapse + trim.

Scale shape: both are single ``map_batches`` passes over zero-copy Arrow
batches using RE2 kernels (``pyarrow.compute``) — no shuffle, no state, no
Python loop over rows; throughput is bounded by the C++ regex engine and
parallelizes embarrassingly.  DuckDB is also RE2, so the exact same
patterns serve as the SQL oracle (leftmost, non-overlapping matches agree
engine-to-engine — verified in tests).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# RE2-safe patterns (no backrefs / lookaround), shared verbatim with the
# DuckDB oracle.  Order matters for redaction: emails first (so the user
# part is consumed before the phone pass sees its digits), then IPs, then
# phones.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PHONE_RE = r"\+\d{9,15}"

PII_PATTERNS = (
    ("n_emails", EMAIL_RE, "<EMAIL>"),
    ("n_ipv4", IPV4_RE, "<IP>"),
    ("n_phones", PHONE_RE, "<PHONE>"),
)


def pii_scrub_batch(
    batch: pa.Table, text_col: str = "text", keep_text: bool = True
) -> pa.Table:
    """Append per-doc PII match counts (on the ORIGINAL text) and the
    redacted ``text_clean`` column (patterns applied in PII_PATTERNS
    order); the original text column is dropped."""
    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    out = batch.select([c for c in batch.column_names if c != text_col])
    clean = texts
    for name, pat, token in PII_PATTERNS:
        out = out.append_column(
            name, pc.count_substring_regex(texts, pat).cast(pa.int64())
        )
        clean = pc.replace_substring_regex(clean, pat, token)
    if keep_text:
        out = out.append_column("text_clean", clean)
    return out


def pii_scrub(ds, text_col: str = "text", keep_text: bool = True):
    return ds.map_batches(
        lambda b: pii_scrub_batch(b, text_col, keep_text),
        batch_format="pyarrow",
    )


def _nfc(texts: pa.Array) -> pa.Array:
    """Unicode NFC.  ``pc.utf8_normalize(form="NFC")`` in this pyarrow build
    returns DECOMPOSED output (utf8proc build quirk — verified: composed
    input comes back as e + U+0301), so composition goes through CPython's
    C ``unicodedata`` instead — but only for the non-ASCII rows, detected
    vectorized via byte-length != char-length (ASCII is NFC-invariant, and
    in a source-code corpus that is ~every row, so the Python path touches
    almost nothing)."""
    import unicodedata

    nb = pc.binary_length(texts).to_numpy(zero_copy_only=False)
    nc = pc.utf8_length(texts).to_numpy(zero_copy_only=False)
    import numpy as np

    nonascii = np.flatnonzero(nb != nc)
    if len(nonascii) == 0:
        return texts
    sub = texts.take(pa.array(nonascii, pa.int64())).to_pylist()
    fixed = [None if s is None else unicodedata.normalize("NFC", s) for s in sub]
    obj = texts.to_numpy(zero_copy_only=False)
    obj[nonascii] = fixed
    return pa.array(obj, pa.string())


def normalize_text_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Replace the text column with its canonical form: Unicode NFC,
    every whitespace run collapsed to one space, ends trimmed."""
    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    norm = _nfc(texts)
    # collapse ASCII whitespace runs (RE2 \s) to one space, then trim spaces.
    # Trim is ASCII-space-only on purpose: it matches SQL trim(), and after
    # the collapse every boundary run IS a single ASCII space.
    norm = pc.utf8_trim(pc.replace_substring_regex(norm, r"\s+", " "), " ")
    out = batch.select([c for c in batch.column_names if c != text_col])
    return out.append_column("text_norm", norm)


def normalize_text(ds, text_col: str = "text"):
    return ds.map_batches(
        lambda b: normalize_text_batch(b, text_col), batch_format="pyarrow"
    )

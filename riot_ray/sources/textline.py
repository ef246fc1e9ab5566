"""Delimited-text-line source.

The reference's benchmark/codelab corpora are text files with
``||||``-separated fields, one document per line
(/root/reference/examples/benchmark/benchmark.go:86-145 — field 9 is the
text; /root/reference/examples/codelab/search_server.go:57-110).  The
Ray-native equivalent: ``read_text`` (streams line blocks) + one vectorized
``map_batches`` splitter — no driver-side parsing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def read_delimited_text(
    paths,
    field_names: list[str],
    sep: str = "||||",
    drop_malformed: bool = True,
):
    """Dataset over delimited text lines: one column per entry of
    ``field_names`` (use None to skip a position), all string-typed.
    Lines with fewer fields than required are dropped (drop_malformed)
    or error."""
    import ray.data as rd

    want = [(i, n) for i, n in enumerate(field_names) if n is not None]
    if not want:
        raise ValueError("field_names must name at least one field (all None)")
    need = max(i for i, _ in want) + 1

    def parse(batch: pa.Table) -> pa.Table:
        lines = batch["text"]
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        lists = pc.split_pattern(lines, sep)
        n_fields = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        ok = n_fields >= need
        if not drop_malformed and not ok.all():
            bad = int((~ok).sum())
            raise ValueError(f"{bad} lines have fewer than {need} fields")
        lists = lists.filter(pa.array(ok))
        cols = {}
        for i, name in want:
            cols[name] = pc.list_element(lists, i)
        return pa.table(cols)

    return rd.read_text(paths).map_batches(parse, batch_format="pyarrow")

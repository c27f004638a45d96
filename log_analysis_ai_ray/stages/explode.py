"""Page → line explosion.

The reference consumes files line-by-line (mmap reader,
``/root/reference/src/file_data_loader.cpp:594-666``). Our input is a
Parquet pages table whose ``text`` column embeds newline-joined log
lines, so the equivalent is a vectorized list-explode: split on ``\\n``,
flatten, and repeat the page-level keys via ``list_parent_indices`` —
no Python row loop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Columns carried from the page into each line row.
CARRY_COLUMNS = ("url", "warc_ts", "lang")


def explode_lines(batch: pa.Table, *, drop_empty: bool = True,
                  carry: tuple[str, ...] = CARRY_COLUMNS) -> pa.Table:
    """Explode pages into one row per log line.

    Output: carry columns + ``line_no: int32`` (position within page) +
    ``line: string``. Empty lines (empty pages) are dropped when
    ``drop_empty`` — the oracle mirrors this with ``WHERE line <> ''``.
    """
    text = batch.column("text")
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    lists = pc.split_pattern(text, pattern="\n")
    parent = pc.list_parent_indices(lists)
    flat = pc.list_flatten(lists)

    offsets = np.asarray(lists.offsets)
    parent_np = np.asarray(parent)
    line_no = (np.arange(len(flat)) - offsets[:-1][parent_np]).astype(np.int32)

    cols = {name: batch.column(name).take(parent) for name in carry}
    cols["line_no"] = pa.array(line_no, type=pa.int32())
    cols["line"] = flat
    out = pa.table(cols)
    if drop_empty:
        out = out.filter(pc.not_equal(out.column("line"), ""))
    return out

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


def join_logical_lines(lines: list[str]) -> list[str]:
    """Merge continuation lines into their parent line (reference
    logical-line joiner, /root/reference/src/file_data_loader.cpp:219-274):
    a line continues the previous one when it starts with
    whitespace (indented stack-trace style) or the previous line ends
    with a backslash. Python-level (used via the distinct-page path or
    in readers for raw text logs; the synthetic pages corpus has no
    continuations)."""
    out: list[str] = []
    for ln in lines:
        cont = out and (
            (ln[:1] in (" ", "\t") and ln.strip() != "")
            or out[-1].endswith("\\")
        )
        if cont:
            prev = out[-1]
            if prev.endswith("\\"):
                prev = prev[:-1].rstrip()
            out[-1] = prev + " " + ln.strip()
        else:
            out.append(ln)
    return out


def explode_lines_joined(batch: pa.Table, *, drop_empty: bool = True,
                         max_line_len: int | None = None,
                         carry: tuple[str, ...] = CARRY_COLUMNS) -> pa.Table:
    """explode_lines variant that first merges continuation lines
    within each page (S4 semantics). ``max_line_len`` forwards to the
    over-long-line drop — merged continuations make oversized lines
    MORE likely, so the joined path needs the guard most (round-4
    review)."""
    text = batch.column("text")
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    joined = pa.array(
        ["\n".join(join_logical_lines(t.split("\n"))) if t else ""
         for t in text.to_pylist()],
        type=pa.string(),
    )
    patched = batch.set_column(
        batch.schema.get_field_index("text"), "text", joined)
    return explode_lines(patched, drop_empty=drop_empty,
                         max_line_len=max_line_len, carry=carry)


def explode_lines(batch: pa.Table, *, drop_empty: bool = True,
                  max_line_len: int | None = None,
                  carry: tuple[str, ...] = CARRY_COLUMNS) -> pa.Table:
    """Explode pages into one row per log line.

    Output: carry columns + ``line_no: int32`` (position within page) +
    ``line: string``. Empty lines (empty pages) are dropped when
    ``drop_empty`` — the oracle mirrors this with ``WHERE line <> ''``.
    ``max_line_len`` drops over-long lines (the reference drops lines
    > 1 MB, /root/reference/src/file_data_loader.cpp:58,647-649);
    default None keeps everything so the byte-identity invariant holds.
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
    if max_line_len is not None:
        out = out.filter(pc.less_equal(
            pc.binary_length(out.column("line")), max_line_len))
    return out

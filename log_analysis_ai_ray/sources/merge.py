"""Timestamp-ordered multi-source merge (reference MultiFileReader,
/root/reference/src/multi_file_reader.cpp:89-126 — a priority-queue
k-way merge producing a globally timestamp-ordered stream).

Ray Data has no streaming merge-read; the equivalent primitive is
union → distributed sort (SURVEY.md S6/O3). The sort is an explicit
all-to-all — callers opt in only when global order is genuinely
required (per-sink aggregates never need it)."""

from __future__ import annotations


def merge_by_timestamp(datasets, ts_col: str = "ts",
                       tie_break: str | None = None):
    """Union N datasets and globally order by timestamp (+ optional
    deterministic tie-break column)."""
    if not datasets:
        raise ValueError("no datasets to merge")
    ds = datasets[0]
    if len(datasets) > 1:
        ds = ds.union(*datasets[1:])
    keys = [ts_col] if tie_break is None else [ts_col, tie_break]
    return ds.sort(keys)

"""Store compaction: content preserved exactly, file count shrinks,
idempotent re-run, crash-safe verify ordering."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from log_analysis_ai_ray.stages.compact import (compact_store, plan_bins)


def _mk_store(root, n_parts=3, files_per=6, rows_per=50):
    rows = {}
    n = 0
    for p in range(n_parts):
        d = os.path.join(root, f"sink_id={p}")
        os.makedirs(d)
        for f in range(files_per):
            t = pa.table({
                "url": pa.array([f"u{p}-{f}-{i}" for i in range(rows_per)]),
                "line_no": pa.array(range(n, n + rows_per),
                                    type=pa.int64())})
            n += rows_per
            pq.write_table(t, os.path.join(d, f"part-{f:04d}.parquet"))
        rows[p] = files_per * rows_per
    return rows


def _snapshot(root):
    out = []
    for dirpath, _, files in os.walk(root):
        for f in sorted(files):
            if f.endswith(".parquet"):
                t = pq.read_table(os.path.join(dirpath, f))
                out.extend(zip(t.column("url").to_pylist(),
                               t.column("line_no").to_pylist()))
    return sorted(out)


def _n_files(root):
    return sum(f.endswith(".parquet") for _, _, fs in os.walk(root)
               for f in fs)


def test_plan_bins_packs_under_target():
    sizes = [10, 20, 70, 40, 5, 55]
    bins = plan_bins(sizes, 100)
    assert sorted(i for b in bins for i in b) == list(range(6))
    for b in bins:
        assert len(b) == 1 or sum(sizes[i] for i in b) <= 100


def test_compact_preserves_content(ray_session, tmp_path):
    root = str(tmp_path / "store")
    os.makedirs(root)
    _mk_store(root)
    before = _snapshot(root)
    assert _n_files(root) == 18
    stats = compact_store(root, target_bytes=1 << 30)
    assert stats["partitions"] == 3
    assert _n_files(root) == 3  # one file per partition
    assert _snapshot(root) == before
    # idempotent: second run has nothing to merge
    stats2 = compact_store(root, target_bytes=1 << 30)
    assert stats2["rewritten"] == 0
    assert _snapshot(root) == before


def test_compact_respects_target_and_deadletter(ray_session, tmp_path):
    root = str(tmp_path / "store")
    os.makedirs(os.path.join(root, "deadletter"))
    for f in range(4):
        t = pa.table({"url": pa.array([f"d{f}"] * 10),
                      "line_no": pa.array(range(10), type=pa.int64())})
        pq.write_table(t, os.path.join(root, "deadletter",
                                       f"part-{f}.parquet"))
    before = _snapshot(root)
    # target so small nothing can pair up -> no rewrites at all
    stats = compact_store(root, target_bytes=1)
    assert stats["rewritten"] == 0 and _n_files(root) == 4
    # generous target -> one file
    compact_store(root, target_bytes=1 << 30)
    assert _n_files(root) == 1
    assert _snapshot(root) == before


def test_zone_map_pruning_parity(ray_session, tmp_path):
    """prune_files_by_stats opens only overlapping files and never
    changes results (conservative on missing stats)."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from log_analysis_ai_ray.stages.route import prune_files_by_stats

    d = tmp_path / "sink_id=0"
    d.mkdir()
    files = []
    for day in (1, 5, 9):
        ts = [dt.datetime(2025, 1, day, h) for h in range(6)]
        t = pa.table({
            "line_ts": pa.array(ts, type=pa.timestamp("us")),
            "v": pa.array(range(6), type=pa.int64())})
        f = str(d / f"part-{day}.parquet")
        pq.write_table(t, f)
        files.append(f)
    lo, hi = dt.datetime(2025, 1, 5), dt.datetime(2025, 1, 6)
    kept = prune_files_by_stats(files, "line_ts", lo, hi)
    assert kept == [files[1]]  # only the day-5 file overlaps
    # missing column -> conservative keep
    assert prune_files_by_stats(files, "nope", lo, hi) == sorted(files)
    # null-only stats file is kept
    fnull = str(d / "part-null.parquet")
    pq.write_table(pa.table({
        "line_ts": pa.array([None, None], type=pa.timestamp("us")),
        "v": pa.array([1, 2], type=pa.int64())}), fnull)
    kept2 = prune_files_by_stats(files + [fnull], "line_ts", lo, hi)
    assert fnull in kept2 and files[1] in kept2

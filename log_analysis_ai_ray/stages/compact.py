"""Small-file compaction for partitioned Parquet stores.

Every long-running store accretes small files: the routed sinks write
one content-keyed part per (block × sink), incremental ingest appends
more, and at 100 TB a reader that must open millions of kilobyte-sized
parts spends its time in metadata, not data (the classic small-files
problem; the same maintenance job every table format runs — e.g.
Iceberg/Delta `rewrite_data_files`).

Scale shape: partitions are independent, so compaction is a pure
fan-out — ONE Ray task per partition directory, no shuffle, no driver
data path.  Within a partition, files are greedily binned to a target
byte size and each bin is rewritten as one part; bins with a single
member are left untouched, so re-running is a no-op (idempotent) and a
killed run resumes for free (a bin's output is content-keyed by its
member filenames and row counts are verified before members are
deleted — crash-safe ordering: write, verify, then delete).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.fs as pafs
import pyarrow.parquet as pq

from .route import _atomic_write_parquet, _resolve_fs

TARGET_BYTES_DEFAULT = 128 << 20


def plan_bins(sizes: list[int], target_bytes: int) -> list[list[int]]:
    """Greedy first-fit over size-sorted file indices: bins of >= 2
    files whose summed size stays under ``target_bytes`` (a single
    oversize file is its own bin and is skipped by the rewriter)."""
    order = sorted(range(len(sizes)), key=lambda i: -sizes[i])
    bins: list[list[int]] = []
    bin_bytes: list[int] = []
    for i in order:
        for j, bb in enumerate(bin_bytes):
            if bb + sizes[i] <= target_bytes:
                bins[j].append(i)
                bin_bytes[j] += sizes[i]
                break
        else:
            bins.append([i])
            bin_bytes.append(sizes[i])
    return bins


def compact_partition(fs: pafs.FileSystem, part_dir: str,
                      target_bytes: int = TARGET_BYTES_DEFAULT,
                      compression: str = "snappy") -> dict:
    """Compact one partition directory in place. Returns counters."""
    infos = [i for i in fs.get_file_info(pafs.FileSelector(part_dir))
             if i.type == pafs.FileType.File
             and i.base_name.endswith(".parquet")]
    infos.sort(key=lambda i: i.base_name)
    sizes = [i.size for i in infos]
    stats = {"files_in": len(infos), "files_out": 0, "rewritten": 0,
             "rows": 0}
    for bin_members in plan_bins(sizes, target_bytes):
        stats["files_out"] += 1
        if len(bin_members) < 2:
            continue
        members = [infos[i] for i in sorted(bin_members)]
        key = hashlib.md5("|".join(m.base_name
                                   for m in members).encode()) \
            .hexdigest()[:16]
        out_name = f"compact-{key}.parquet"
        tables = [pq.read_table(m.path, filesystem=fs) for m in members]
        merged = pa.concat_tables(tables, promote_options="default")
        existing = fs.get_file_info(f"{part_dir}/{out_name}")
        if existing.type != pafs.FileType.File:
            _atomic_write_parquet(fs, merged, part_dir, out_name,
                                  compression)
        # verify BEFORE deleting the members (crash-safe ordering)
        written = pq.read_metadata(f"{part_dir}/{out_name}",
                                   filesystem=fs).num_rows
        if written != merged.num_rows:
            raise RuntimeError(
                f"compaction verify failed in {part_dir}: "
                f"{written} != {merged.num_rows}")
        for m in members:
            fs.delete_file(m.path)
        stats["rewritten"] += len(members)
        stats["rows"] += merged.num_rows
    return stats


def compact_store(store_dir: str,
                  target_bytes: int = TARGET_BYTES_DEFAULT,
                  compression: str = "snappy", filesystem=None,
                  partition_prefixes: tuple[str, ...] = ("sink_id=",
                                                         "deadletter"),
                  concurrency: int | None = None) -> dict:
    """Compact every partition of a routed store: one Ray task per
    partition directory (map_batches over the partition list — the
    work is per-directory I/O, so the 'row' is a partition)."""
    import ray.data

    fs = _resolve_fs(filesystem)
    parts = [i.path for i in fs.get_file_info(pafs.FileSelector(store_dir))
             if i.type == pafs.FileType.Directory
             and (i.base_name.startswith(partition_prefixes[0])
                  or i.base_name in partition_prefixes[1:])]
    if not parts:
        return {"partitions": 0, "files_in": 0, "files_out": 0,
                "rewritten": 0, "rows": 0}

    fs_kind = ("local" if isinstance(fs, pafs.LocalFileSystem) else None)

    def one(t: pa.Table) -> pa.Table:
        fs_w = pafs.LocalFileSystem() if fs_kind == "local" else \
            _resolve_fs(None)
        rows = []
        for p in t.column("part").to_pylist():
            rows.append(compact_partition(fs_w, p, target_bytes,
                                          compression))
        return pa.table({
            "files_in": pa.array([r["files_in"] for r in rows]),
            "files_out": pa.array([r["files_out"] for r in rows]),
            "rewritten": pa.array([r["rewritten"] for r in rows]),
            "rows": pa.array([r["rows"] for r in rows]),
        })

    res = ray.data.from_arrow(
        pa.table({"part": pa.array(parts, type=pa.string())})) \
        .repartition(len(parts)) \
        .map_batches(one, batch_format="pyarrow", batch_size=1,
                     concurrency=concurrency)
    agg = {"partitions": len(parts)}
    out = res.take_all()
    for k in ("files_in", "files_out", "rewritten", "rows"):
        agg[k] = int(sum(r[k] for r in out))
    return agg

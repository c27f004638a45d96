"""Fan-out routing to per-template-bucket Parquet sinks.

The reference routes parsed rows into per-template stores (DuckDB
``log_entries`` keyed by template_id, /root/reference/python/logai_agent.py:254-281;
Qdrant points keyed by hash(template), python/vector_store.py:35-56).
At web scale per-distinct-template sinks would explode the file count,
so sinks are BUCKETED: ``sink_id = template_hash % num_sinks``
(SURVEY.md §4.2) — per-template counts remain exact inside each bucket
file, and the bucket count bounds output fan-out.

Output is partitioned Parquet (one directory per sink) plus a JSON
manifest of per-sink row counts — the resumability/verification unit.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc
from pyarrow import fs as pafs

DEFAULT_NUM_SINKS = 16


def _resolve_fs(filesystem) -> pafs.FileSystem:
    """None → LocalFileSystem. On a multi-node cluster pass a shared
    filesystem (S3FileSystem, HadoopFileSystem, or a SubTreeFileSystem
    over a mount) so every worker's fan-out lands in one namespace —
    a plain local path would scatter sink files across worker disks."""
    return filesystem if filesystem is not None else pafs.LocalFileSystem()


def _atomic_write_parquet(fs: pafs.FileSystem, table: pa.Table,
                          dir_path: str, fname: str,
                          compression: str) -> None:
    """tmp+rename on local filesystems (atomic replace for retried
    tasks); direct single-shot write elsewhere (object stores already
    commit puts atomically)."""
    import pyarrow.parquet as pq

    fs.create_dir(dir_path, recursive=True)
    full = f"{dir_path}/{fname}"
    if isinstance(fs, pafs.LocalFileSystem):
        pq.write_table(table, full + ".tmp", compression=compression,
                       filesystem=fs)
        fs.move(full + ".tmp", full)
    else:
        pq.write_table(table, full, compression=compression, filesystem=fs)

# Columns persisted per routed row (wide page payloads projected away).
ROUTED_COLUMNS = [
    "url", "line_no", "line", "level", "line_ts", "template",
    "template_hash", "domain", "domain_tier", "lang", "lang_name",
    "parse_ok", "sink_id",
]


def add_sink_id(batch: pa.Table, num_sinks: int = DEFAULT_NUM_SINKS) -> pa.Table:
    h = batch.column("template_hash")  # md5-based, always non-negative
    sink = pc.cast(pc.subtract(h, pc.multiply(pc.divide(h, num_sinks),
                                              num_sinks)), pa.int32())
    return batch.append_column("sink_id", sink)


class RouteWriteEmitPartials:
    """Fused route-write + aggregate-combiner stage.

    Writes each block's rows into per-sink Parquet files (the fan-out
    side effect) and RETURNS the block's combined aggregate partials as
    its output — so routing and all flagship aggregates share a single
    pass over the parsed stream instead of write-then-read-back.

    Retry-safe: the output filename is a content fingerprint of the
    block (first AND last rows' url|line_no, row count, and a line_no
    checksum — two different blocks colliding would need identical
    boundary rows, size and positional sum), written atomically — a
    retried task overwrites its own file instead of duplicating rows.
    """

    def __init__(self, out_dir: str, num_sinks: int,
                 columns: list[str] | None = None,
                 compression: str = "snappy", filesystem=None):
        # snappy by default: sink encode is on the critical path of the
        # fused route stage; zstd costs ~3x the CPU for ~30% smaller
        # files — flip via config when storage dominates
        self.out_dir = out_dir
        self.num_sinks = num_sinks
        self.columns = columns or ROUTED_COLUMNS
        self.compression = compression
        self.fs = _resolve_fs(filesystem)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        import numpy as np

        from .aggregate import combined_partials

        batch = add_sink_id(batch, self.num_sinks)
        cols = [c for c in self.columns if c in batch.column_names]
        if "path" in batch.column_names:  # opt-in row-level lineage
            cols.append("path")
        routed = batch.select(cols)
        n = routed.num_rows
        if n == 0:
            # a block of pages whose text exploded to zero lines must
            # not crash the [0]/[n-1] fingerprint (round-4 review);
            # nothing to write, but the typed empty partials must flow
            return combined_partials(batch)
        line_no = np.asarray(routed.column("line_no"), dtype=np.int64)
        fp = hashlib.md5("|".join([
            str(routed.column("url")[0].as_py()), str(line_no[0]),
            str(routed.column("url")[n - 1].as_py()), str(line_no[n - 1]),
            str(n), str(int(line_no.sum())),
        ]).encode()).hexdigest()[:16]

        # dead-letter routing (reference validate() gating, M19:
        # /root/reference/src/json_parser.cpp:71-78): malformed rows go
        # to their own sink directory, never an exception; the union of
        # sinks + dead letters is exactly the input line multiset.
        ok = routed.column("parse_ok")
        dead = routed.filter(pc.invert(ok))
        routed_ok = routed.filter(ok)
        if dead.num_rows:
            _atomic_write_parquet(
                self.fs, dead.drop_columns(["sink_id"]),
                f"{self.out_dir}/deadletter", f"part-{fp}.parquet",
                self.compression)

        sinks = pc.unique(routed_ok.column("sink_id"))
        for s in sorted(sinks.to_pylist()):
            part = routed_ok.filter(pc.equal(routed_ok.column("sink_id"), s))
            _atomic_write_parquet(
                self.fs, part.drop_columns(["sink_id"]),
                f"{self.out_dir}/sink_id={s}", f"part-{fp}.parquet",
                self.compression)
        return combined_partials(batch)


def route_write_with_partials(parsed_ds, out_dir: str,
                              num_sinks: int = DEFAULT_NUM_SINKS,
                              columns: list[str] | None = None,
                              filesystem=None):
    """One-pass route + aggregate: returns the partials Dataset (lazy);
    consuming it performs the sink writes as a side effect."""
    fs = _resolve_fs(filesystem)
    # fresh sinks: stale files from a previous run with different block
    # boundaries would otherwise survive (filenames are content-keyed)
    base = fs.get_file_info(out_dir)
    if base.type == pafs.FileType.Directory:
        for info in fs.get_file_info(pafs.FileSelector(out_dir)):
            name = info.base_name
            if name.startswith("sink_id=") or name == "deadletter":
                fs.delete_dir(info.path)
    fs.create_dir(out_dir, recursive=True)
    return parsed_ds.map_batches(
        RouteWriteEmitPartials(out_dir, num_sinks, columns,
                               filesystem=filesystem),
        batch_format="pyarrow", batch_size=None)


def route_and_write(parsed_ds, out_dir: str,
                    num_sinks: int = DEFAULT_NUM_SINKS,
                    columns: list[str] | None = None,
                    filesystem=None) -> dict:
    """Write routed rows as Parquet partitioned by sink_id; returns the
    per-sink count manifest (also persisted as _manifest.json)."""
    fs = _resolve_fs(filesystem)
    columns = columns or ROUTED_COLUMNS
    routed = parsed_ds.map_batches(
        add_sink_id, batch_format="pyarrow", batch_size=None,
        fn_kwargs={"num_sinks": num_sinks},
    ).map_batches(
        lambda t: t.select(columns), batch_format="pyarrow",
        batch_size=None,
    )
    routed.write_parquet(out_dir, partition_cols=["sink_id"],
                         filesystem=filesystem)

    manifest = sink_manifest_from_output(out_dir, filesystem=fs)
    with fs.open_output_stream(f"{out_dir}/_manifest.json") as f:
        f.write(json.dumps(manifest, indent=1, sort_keys=True).encode())
    return manifest


def list_sink_files(out_dir: str, filesystem=None,
                    include_dead: bool = False) -> list[str]:
    """Filesystem-parameterized sink listing (works on any
    pyarrow.fs.FileSystem — the multi-node story: a local glob only
    sees the driver's disk)."""
    fs = _resolve_fs(filesystem)
    infos = fs.get_file_info(pafs.FileSelector(out_dir, recursive=True,
                                               allow_not_found=True))
    out = []
    for i in infos:
        if not i.is_file or not i.path.endswith(".parquet"):
            continue
        parent = os.path.basename(os.path.dirname(i.path))
        if parent.startswith("sink_id=") or (include_dead
                                             and parent == "deadletter"):
            out.append(i.path)
    return sorted(out)


def sink_manifest_from_output(out_dir: str, filesystem=None) -> dict:
    """Recount routed rows per sink from the written files (verifies the
    sink contents, not just the intent). Counts come from parquet FOOTER
    metadata (no data read) fetched with a thread pool — a serial
    per-file scan here was a measurable serial floor in the route
    stage."""
    from concurrent.futures import ThreadPoolExecutor

    import pyarrow.parquet as pq

    fs = _resolve_fs(filesystem)
    all_files = list_sink_files(out_dir, filesystem=fs, include_dead=True)
    files = [p for p in all_files
             if os.path.basename(os.path.dirname(p)).startswith("sink_id=")]
    dead_files = [p for p in all_files
                  if os.path.basename(os.path.dirname(p)) == "deadletter"]

    def count(path: str) -> tuple[str, int]:
        sink = os.path.basename(os.path.dirname(path)).split("=", 1)[-1]
        return sink, pq.read_metadata(path, filesystem=fs).num_rows

    counts: dict[str, int] = {}
    with ThreadPoolExecutor(max_workers=16) as ex:
        for sink, n in ex.map(count, files):
            counts[sink] = counts.get(sink, 0) + n
    dead = 0
    for p_ in dead_files:
        dead += pq.read_metadata(p_, filesystem=fs).num_rows
    return {"per_sink_rows": counts, "dead_letter_rows": dead,
            "total_rows": sum(counts.values()) + dead}


def prune_files_by_stats(files: list[str], column: str, lo, hi,
                         filesystem=None) -> list[str]:
    """Zone-map pruning: keep only files whose parquet row-group
    statistics for ``column`` can overlap [lo, hi). Footers are a few
    KB each — reading them costs metadata, not data, and the pruned
    list means a time-range query opens only the sinks' files that can
    contain matches (classic min/max zone maps / Iceberg-style file
    skipping). Conservative by construction: files lacking stats (or
    with null-only pages) are KEPT, so pruning can never change a
    query's result — asserted by parity tests.

    The footer sweep is a Ray task fan-out over the file list (one
    footer read per row), so at 10^6 store files the driver never
    touches a footer."""
    import pyarrow.parquet as pq
    import ray
    import ray.data

    from .aggregate import _to_arrow

    if not files:
        return []
    fs = _resolve_fs(filesystem)

    def check(t: pa.Table) -> pa.Table:
        keep = []
        for path in t.column("path").to_pylist():
            # the CALLER's filesystem ships in the task closure
            # (pyarrow filesystems pickle); the old local-only branch
            # made every remote-fs prune read fail (round-4 review)
            md = pq.ParquetFile(path, filesystem=fs).metadata
            names = {md.schema.column(i).name: i
                     for i in range(md.num_columns)}
            if column not in names:
                keep.append(True)
                continue
            ci = names[column]
            overlap = False
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                if st is None or not st.has_min_max:
                    overlap = True
                    break
                if not (st.max < lo or st.min >= hi):
                    overlap = True
                    break
            keep.append(overlap)
        return pa.table({"path": t.column("path"),
                         "keep": pa.array(keep, type=pa.bool_())})

    n = len(files)
    flags = _to_arrow(ray.data.from_arrow(
        pa.table({"path": pa.array(files, type=pa.string())}))
        .repartition(max(1, min(n, 32)))
        .map_batches(check, batch_format="pyarrow"))
    kept = flags.filter(flags.column("keep")).column("path").to_pylist()
    return sorted(kept)

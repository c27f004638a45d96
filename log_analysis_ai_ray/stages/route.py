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

DEFAULT_NUM_SINKS = 16

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
    block (first url/line_no + row count), written via tmp+rename — a
    retried task atomically overwrites its own file instead of
    duplicating rows.
    """

    def __init__(self, out_dir: str, num_sinks: int,
                 columns: list[str] | None = None,
                 compression: str = "snappy"):
        # snappy by default: sink encode is on the critical path of the
        # fused route stage; zstd costs ~3x the CPU for ~30% smaller
        # files — flip via config when storage dominates
        self.out_dir = out_dir
        self.num_sinks = num_sinks
        self.columns = columns or ROUTED_COLUMNS
        self.compression = compression

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        import pyarrow.parquet as pq

        from .aggregate import combined_partials

        batch = add_sink_id(batch, self.num_sinks)
        cols = [c for c in self.columns if c in batch.column_names]
        if "path" in batch.column_names:  # opt-in row-level lineage
            cols.append("path")
        routed = batch.select(cols)
        fp = hashlib.md5(
            f"{routed.column('url')[0].as_py()}|"
            f"{routed.column('line_no')[0].as_py()}|"
            f"{routed.num_rows}".encode()).hexdigest()[:16]

        # dead-letter routing (reference validate() gating, M19:
        # /root/reference/src/json_parser.cpp:71-78): malformed rows go
        # to their own sink directory, never an exception; the union of
        # sinks + dead letters is exactly the input line multiset.
        ok = routed.column("parse_ok")
        dead = routed.filter(pc.invert(ok))
        routed_ok = routed.filter(ok)
        if dead.num_rows:
            d = os.path.join(self.out_dir, "deadletter")
            os.makedirs(d, exist_ok=True)
            path = os.path.join(d, f"part-{fp}.parquet")
            pq.write_table(dead.drop_columns(["sink_id"]), path + ".tmp",
                           compression=self.compression)
            os.replace(path + ".tmp", path)

        sinks = pc.unique(routed_ok.column("sink_id"))
        for s in sorted(sinks.to_pylist()):
            part = routed_ok.filter(pc.equal(routed_ok.column("sink_id"), s))
            d = os.path.join(self.out_dir, f"sink_id={s}")
            os.makedirs(d, exist_ok=True)
            path = os.path.join(d, f"part-{fp}.parquet")
            pq.write_table(part.drop_columns(["sink_id"]), path + ".tmp",
                           compression=self.compression)
            os.replace(path + ".tmp", path)
        return combined_partials(batch)


def route_write_with_partials(parsed_ds, out_dir: str,
                              num_sinks: int = DEFAULT_NUM_SINKS,
                              columns: list[str] | None = None):
    """One-pass route + aggregate: returns the partials Dataset (lazy);
    consuming it performs the sink writes as a side effect."""
    import shutil

    # fresh sinks: stale files from a previous run with different block
    # boundaries would otherwise survive (filenames are content-keyed)
    for name in os.listdir(out_dir) if os.path.isdir(out_dir) else []:
        if name.startswith("sink_id=") or name == "deadletter":
            shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    return parsed_ds.map_batches(
        RouteWriteEmitPartials(out_dir, num_sinks, columns),
        batch_format="pyarrow", batch_size=None)


def route_and_write(parsed_ds, out_dir: str,
                    num_sinks: int = DEFAULT_NUM_SINKS,
                    columns: list[str] | None = None) -> dict:
    """Write routed rows as Parquet partitioned by sink_id; returns the
    per-sink count manifest (also persisted as _manifest.json)."""
    columns = columns or ROUTED_COLUMNS
    routed = parsed_ds.map_batches(
        add_sink_id, batch_format="pyarrow", batch_size=None,
        fn_kwargs={"num_sinks": num_sinks},
    ).map_batches(
        lambda t: t.select(columns), batch_format="pyarrow",
        batch_size=None,
    )
    routed.write_parquet(out_dir, partition_cols=["sink_id"])

    manifest = sink_manifest_from_output(out_dir)
    with open(os.path.join(out_dir, "_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def sink_manifest_from_output(out_dir: str) -> dict:
    """Recount routed rows per sink from the written files (verifies the
    sink contents, not just the intent). Counts come from parquet FOOTER
    metadata (no data read) fetched with a thread pool — a serial
    per-file scan here was a measurable serial floor in the route
    stage."""
    import glob
    from concurrent.futures import ThreadPoolExecutor

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(out_dir, "sink_id=*", "*.parquet")))
    dead_files = sorted(glob.glob(os.path.join(out_dir, "deadletter",
                                               "*.parquet")))

    def count(path: str) -> tuple[str, int]:
        sink = os.path.basename(os.path.dirname(path)).split("=", 1)[-1]
        return sink, pq.ParquetFile(path).metadata.num_rows

    counts: dict[str, int] = {}
    with ThreadPoolExecutor(max_workers=16) as ex:
        for sink, n in ex.map(count, files):
            counts[sink] = counts.get(sink, 0) + n
    dead = 0
    for p_ in dead_files:
        dead += pq.ParquetFile(p_).metadata.num_rows
    return {"per_sink_rows": counts, "dead_letter_rows": dead,
            "total_rows": sum(counts.values()) + dead}

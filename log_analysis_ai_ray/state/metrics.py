"""Per-stage metrics and lineage.

The reference keeps atomic progress/failure counters
(/root/reference/src/file_data_loader.h:162-167). Distributed
equivalent: metrics are AGGREGATES over the data (computed with the
same partial/final discipline as any other aggregate) plus Ray's own
``ds.stats()`` per-stage wall-time breakdown, persisted as JSON next to
the output.

Lineage: every parsed line is attributed to ``(source_path, url,
line_no)`` — source_path from ``read_parquet(include_paths=True)``,
url unique per page, line_no the position within the page. That triple
is a stable provenance key across any parallelism.
"""

from __future__ import annotations

import json
import os


def write_metrics(out_dir: str, name: str, payload: dict,
                  filesystem=None) -> str:
    from ..stages.route import _resolve_fs

    fs = _resolve_fs(filesystem)
    fs.create_dir(out_dir, recursive=True)
    path = f"{out_dir}/{name}.json"
    data = json.dumps(payload, indent=1, sort_keys=True,
                      default=str).encode()
    from pyarrow import fs as pafs
    if isinstance(fs, pafs.LocalFileSystem):
        with fs.open_output_stream(path + ".tmp") as f:
            f.write(data)
        fs.move(path + ".tmp", path)
    else:
        with fs.open_output_stream(path) as f:
            f.write(data)
    return path


def parse_quality_metrics(parsed_ds) -> dict:
    """Parse success/failure counters as a distributed aggregate."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.aggregate import _to_arrow

    def partial(batch: pa.Table) -> pa.Table:
        ok = pc.sum(pc.cast(batch.column("parse_ok"), pa.int64())).as_py() or 0
        return pa.table({
            "rows": pa.array([batch.num_rows], type=pa.int64()),
            "parse_ok": pa.array([ok], type=pa.int64()),
        })

    t = _to_arrow(parsed_ds.map_batches(partial, batch_format="pyarrow"))
    if "rows" not in t.column_names:
        # fully-empty dataset: schema-less blocks (round-4 review)
        return {"rows": 0, "parse_ok": 0, "parse_failed": 0}
    rows = pc.sum(t.column("rows")).as_py() or 0
    ok = pc.sum(t.column("parse_ok")).as_py() or 0
    return {"rows": rows, "parse_ok": ok, "parse_failed": rows - ok}

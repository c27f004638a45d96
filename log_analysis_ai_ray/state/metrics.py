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


def write_metrics(out_dir: str, name: str, payload: dict) -> str:
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{name}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True, default=str)
    os.replace(tmp, path)
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
    rows = pc.sum(t.column("rows")).as_py() or 0
    ok = pc.sum(t.column("parse_ok")).as_py() or 0
    return {"rows": rows, "parse_ok": ok, "parse_failed": rows - ok}

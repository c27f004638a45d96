"""Raw-log sources: text / CSV / JSON readers with the reference's
parser-family semantics applied as vectorized batch stages.

Reference: parser selection by format string
(/root/reference/src/file_data_loader.cpp:351-363) — csv → CsvParser,
json → JsonParser, drain → DrainParser, else RegexParser; plus the thin
file readers (:668-702). Here each format maps to a
``ray.data.read_*`` source + an Arrow transform; gzip et al. are
handled natively by Arrow.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.timestamps import parse_timestamp_cascade


def read_text_lines(paths, **kwargs):
    """Line source (reference LineParser, src/line_parser.cpp:9-32):
    one row per line, message = line."""
    import ray.data

    ds = ray.data.read_text(paths, **kwargs)

    def to_lines(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["line"])

    return ds.map_batches(to_lines, batch_format="pyarrow")


def read_csv_logs(paths, dimensions: dict[str, str] | None = None,
                  timestamp_format: str | None = None, **kwargs):
    """CSV source with the reference's dimension mapping
    (src/csv_parser.cpp:78-135): ``dimensions`` maps logical fields
    (body/timestamp/severity) to CSV column names; remaining columns
    ride along as attributes.
    """
    import ray.data

    ds = ray.data.read_csv(paths, **kwargs)
    dims = dimensions or {}

    def apply_dims(batch: pa.Table) -> pa.Table:
        out = batch
        if "body" in dims and dims["body"] in out.column_names:
            out = out.append_column("message", out.column(dims["body"]))
        if "severity" in dims and dims["severity"] in out.column_names:
            out = out.append_column(
                "level", pc.cast(out.column(dims["severity"]), pa.string()))
        if "timestamp" in dims and dims["timestamp"] in out.column_names:
            raw = pc.cast(out.column(dims["timestamp"]), pa.string())
            fmts = ((timestamp_format,) if timestamp_format else None)
            ts = (parse_timestamp_cascade(raw, fmts)
                  if fmts else parse_timestamp_cascade(raw))
            out = out.append_column("ts", ts)
        return out

    return ds.map_batches(apply_dims, batch_format="pyarrow")


# JSON heuristic key fallbacks (reference JsonParser,
# src/json_parser.cpp:80-141): message|msg, level|severity,
# timestamp|time.
JSON_MESSAGE_KEYS = ("message", "msg")
JSON_LEVEL_KEYS = ("level", "severity")
JSON_TS_KEYS = ("timestamp", "time")


def read_json_logs(paths, **kwargs):
    """JSON-lines source with heuristic field extraction: known keys →
    fixed columns (message/level/ts); all scalar fields stringified
    into an ``attrs`` map column (the reference stringifies scalars
    into its fields map, src/json_parser.cpp:126-134)."""
    import ray.data

    ds = ray.data.read_json(paths, **kwargs)
    return ds.map_batches(json_heuristic_extract, batch_format="pyarrow")


def _first_present(batch: pa.Table, keys) -> pa.Array | None:
    cols = [pc.cast(batch.column(k), pa.string())
            for k in keys if k in batch.column_names]
    if not cols:
        return None
    out = cols[0]
    for c in cols[1:]:
        out = pc.coalesce(out, c)
    return out


def json_heuristic_extract(batch: pa.Table) -> pa.Table:
    message = _first_present(batch, JSON_MESSAGE_KEYS)
    level = _first_present(batch, JSON_LEVEL_KEYS)
    ts_raw = _first_present(batch, JSON_TS_KEYS)

    n = batch.num_rows
    known = set(JSON_MESSAGE_KEYS) | set(JSON_LEVEL_KEYS) | set(JSON_TS_KEYS)
    extra = [c for c in batch.column_names if c not in known]
    # attrs map: stringified scalars of all non-core keys
    keys_flat, vals_flat, offsets = [], [], [0]
    extra_cols = {c: pc.cast(batch.column(c), pa.string()).to_pylist()
                  for c in extra}
    for i in range(n):
        for c in extra:
            v = extra_cols[c][i]
            if v is not None:
                keys_flat.append(c)
                vals_flat.append(v)
        offsets.append(len(keys_flat))
    attrs = pa.MapArray.from_arrays(
        pa.array(offsets, type=pa.int32()),
        pa.array(keys_flat, type=pa.string()),
        pa.array(vals_flat, type=pa.string()))

    out = pa.table({
        "message": message if message is not None
        else pa.nulls(n, pa.string()),
        "level": (level if level is not None
                  else pa.nulls(n, pa.string())).fill_null("INFO"),
        "ts": parse_timestamp_cascade(
            ts_raw if ts_raw is not None else pa.nulls(n, pa.string())),
        "attrs": attrs,
    })
    return out

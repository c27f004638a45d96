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


# Extension-driven decompression (reference dispatches gz/bz2/zlib by
# extension, src/file_data_loader.cpp:93-116; Arrow decodes the stream
# so the line-reader path is identical for all of them).
_COMPRESSION_BY_EXT = ((".gz", "gzip"), (".bz2", "bz2"), (".zst", "zstd"),
                       (".lz4", "lz4"), (".zlib", "zlib"))


def _compression_of(path: str) -> str | None:
    for ext, comp in _COMPRESSION_BY_EXT:
        if path.endswith(ext):
            return comp
    return None


def read_text_lines(paths, **kwargs):
    """Line source (reference LineParser, src/line_parser.cpp:9-32):
    one row per line, message = line. Compressed files (.gz/.bz2/...)
    are grouped by codec and decompressed by Arrow's stream reader;
    mixed lists union into one Dataset."""
    import ray.data

    plist = [paths] if isinstance(paths, str) else list(paths)
    groups: dict[str | None, list[str]] = {}
    for p in plist:
        groups.setdefault(_compression_of(p), []).append(p)

    parts = []
    for comp in sorted(groups, key=lambda c: c or ""):
        if comp == "zlib":
            # raw zlib (RFC1950) has no Arrow codec — whole-file
            # inflate per task (mirrors the reference's zlib branch,
            # src/file_data_loader.cpp:93-116); file-level
            # parallelism, empty lines dropped like read_text
            if kwargs:
                # silently dropping reader options would give
                # extension-dependent behavior for the same call
                raise ValueError(
                    "read_text_lines: reader kwargs are not "
                    f"supported for raw .zlib inputs: {sorted(kwargs)}")
            import zlib

            def inflate(batch: pa.Table) -> pa.Table:
                texts = []
                for buf in batch.column("bytes"):
                    data = zlib.decompress(buf.as_py())
                    texts.extend(
                        ln for ln in
                        data.decode("utf-8", "replace").splitlines()
                        if ln)
                return pa.table({"text": pa.array(texts,
                                                  pa.string())})

            parts.append(
                ray.data.read_binary_files(groups[comp])
                .map_batches(inflate, batch_format="pyarrow"))
            continue
        kw = dict(kwargs)
        if comp is not None:
            kw["arrow_open_stream_args"] = {"compression": comp}
        parts.append(ray.data.read_text(groups[comp], **kw))
    ds = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])

    def to_lines(batch: pa.Table) -> pa.Table:
        # rename BY NAME: kwargs like include_paths add columns, and a
        # positional single-name rename then raises (round-4 review)
        return batch.rename_columns(
            ["line" if c == "text" else c for c in batch.column_names])

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

    def _put(t: pa.Table, name: str, col) -> pa.Table:
        # overwrite when the logical name collides with a CSV column
        # (e.g. the timestamp column is itself named "ts")
        if name in t.column_names:
            return t.set_column(t.schema.get_field_index(name), name, col)
        return t.append_column(name, col)

    def apply_dims(batch: pa.Table) -> pa.Table:
        out = batch
        if "body" in dims and dims["body"] in out.column_names:
            out = _put(out, "message", out.column(dims["body"]))
        if "severity" in dims and dims["severity"] in out.column_names:
            out = _put(out, "level",
                       pc.cast(out.column(dims["severity"]), pa.string()))
        if "timestamp" in dims and dims["timestamp"] in out.column_names:
            raw = pc.cast(out.column(dims["timestamp"]), pa.string())
            fmts = ((timestamp_format,) if timestamp_format else None)
            ts = (parse_timestamp_cascade(raw, fmts)
                  if fmts else parse_timestamp_cascade(raw))
            out = _put(out, "ts", ts)
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


def _stringify(col):
    """Scalar columns cast to string; NESTED (struct/list/map) columns
    JSON-encode per row — Arrow has no struct→utf8 cast and a nested
    field in the input crashed the whole stage (round-4 review
    finding)."""
    typ = col.type if not isinstance(col, pa.ChunkedArray) \
        else col.type
    if pa.types.is_nested(typ):
        import json as _json

        return pa.array(
            [None if v is None else _json.dumps(v, sort_keys=True,
                                                default=str)
             for v in col.to_pylist()], type=pa.string())
    return pc.cast(col, pa.string())


def _first_present(batch: pa.Table, keys) -> pa.Array | None:
    cols = [_stringify(batch.column(k))
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
    # attrs map: stringified scalars of all non-core keys, built from
    # offsets (vectorized — no per-row loop). Cell (row i, col j) of
    # the column-concatenated flat array lives at j*n + i, so a
    # row-major nonzero over the validity mask yields take indices
    # that interleave columns per row in declaration order.
    if extra:
        import numpy as np

        cols = [_stringify(batch.column(c)) for c in extra]
        mask = np.column_stack(
            [np.asarray(pc.is_valid(c)) for c in cols])  # (n, k)
        row_idx, col_idx = np.nonzero(mask)  # row-major order
        offsets = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(mask.sum(axis=1), out=offsets[1:])
        flat_vals = pa.concat_arrays(
            [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
             for c in cols])
        vals = pc.take(flat_vals, pa.array(col_idx * n + row_idx,
                                           type=pa.int64()))
        keys = pa.array(np.array(extra, dtype=object)[col_idx],
                        type=pa.string())
        attrs = pa.MapArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                        keys, vals)
    else:
        attrs = pa.MapArray.from_arrays(
            pa.array([0] * (n + 1), type=pa.int32()),
            pa.array([], type=pa.string()), pa.array([], type=pa.string()))

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

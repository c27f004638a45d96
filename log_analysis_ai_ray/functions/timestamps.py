"""Timestamp cascade parsing, vectorized.

The reference parses timestamps by trying a configured format then a
fixed fallback cascade (``/root/reference/src/json_parser.cpp:24-41``,
``src/csv_parser.cpp:58-76``), and syslog adds current-year inference
(``src/syslog_parser.cpp:71-88``). Here the cascade is a chain of
``pc.strptime(..., error_is_null=True)`` calls folded with
``pc.coalesce`` — each kernel is vectorized over the whole batch, and
rows resolved by an earlier format are simply nulls that later formats
cannot overwrite.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# Reference fallback cascade, src/json_parser.cpp:24-41 (ISO first since
# our synthetic lines use it; order only matters for ambiguous strings).
DEFAULT_FORMATS = (
    "%Y-%m-%d %H:%M:%S",
    "%Y-%m-%dT%H:%M:%S",
    "%Y/%m/%d %H:%M:%S",
    "%d/%b/%Y:%H:%M:%S",
)


def parse_timestamp_cascade(arr: pa.ChunkedArray | pa.Array,
                            formats: tuple[str, ...] = DEFAULT_FORMATS,
                            unit: str = "us") -> pa.ChunkedArray | pa.Array:
    """Try each format in order; first success wins; unparseable → null."""
    out = None
    for fmt in formats:
        parsed = pc.strptime(arr, format=fmt, unit=unit, error_is_null=True)
        out = parsed if out is None else pc.coalesce(out, parsed)
    return out


def floor_hour(ts: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    """Hour bucket (the reference's ``group_by_time`` default 'H',
    /root/reference/python/data_analysis_agent.py:175)."""
    return pc.floor_temporal(ts, unit="hour")

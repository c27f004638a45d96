"""Canonical Arrow schemas (FIXTURES.md F1–F4).

One logical table = one ``ray.data.Dataset``; blocks are
``pyarrow.Table``. The input table shape is fixed by BASELINE.json
``input_hint``: Common-Crawl-style web pages.
"""

from __future__ import annotations

import pyarrow as pa

# F1 — primary input (input_hint): Common-Crawl-style pages.
PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

# F2 — parsed/enriched line-level output of the parse+mine stage.
PARSED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("lang", pa.string()),
        ("line_no", pa.int32()),
        ("line", pa.string()),
        ("level", pa.string()),
        ("line_ts", pa.timestamp("us")),
        ("template", pa.string()),
        ("template_hash", pa.int64()),
        ("params", pa.list_(pa.string())),
        ("domain", pa.string()),
        ("domain_tier", pa.string()),
        ("lang_name", pa.string()),
        ("parse_ok", pa.bool_()),
    ]
)

# F3 — template registry (small aggregate).
REGISTRY_SCHEMA = pa.schema(
    [
        ("template_hash", pa.int64()),
        ("template", pa.string()),
        ("count", pa.int64()),
        ("n_params", pa.int32()),
        ("first_ts", pa.timestamp("us")),
        ("last_ts", pa.timestamp("us")),
    ]
)

# F4 — time-bucket rollup with anomaly z-scores.
ROLLUP_SCHEMA = pa.schema(
    [
        ("template_hash", pa.int64()),
        ("bucket", pa.timestamp("us")),
        ("count", pa.int64()),
        ("mean_count", pa.float64()),
        ("std_count", pa.float64()),
        ("anomaly_score", pa.float64()),
    ]
)

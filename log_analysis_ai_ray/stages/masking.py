"""Deterministic line normalization ("masking") — the preprocess step.

Mirrors the reference's Drain preprocessing: strip the bracketed
timestamp header and wildcard variable tokens before clustering
(``/root/reference/src/drain_parser.cpp:97-127`` strip patterns;
``src/preprocessor.cpp:52-86`` regex replace chain). Both Arrow and
DuckDB use RE2, so the exact same pattern strings run in
``pc.replace_substring_regex`` and in the SQL oracle's
``regexp_replace`` — masking is therefore fully oracle-checkable.

Chain (order matters):
  1. strip leading ``[...]`` header (the ``[{ts}] `` prefix)
  2. hex literals      -> ``<*>``
  3. dotted numbers    -> ``<*>``   (floats AND dotted IPs in one rule)
  4. integer runs      -> ``<*>``
  5. collapse ASCII whitespace; strip edge spaces via RE2 (engine trim
     functions disagree on Unicode whitespace — Arrow's utf8_trim is
     Unicode-aware, DuckDB's trim is not \t-aware — so BOTH sides use
     the same regex and parity holds by construction)
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# (pattern, replacement) applied in order. RE2 syntax, identical in DuckDB.
MASK_RULES: list[tuple[str, str]] = [
    (r"^\[[^\]]*\]\s*", ""),
    (r"0x[0-9a-fA-F]+", "<*>"),
    (r"\d+\.\d+(\.\d+)*", "<*>"),
    (r"\d+", "<*>"),
    (r"\s+", " "),
    (r"^ +| +$", ""),
]


def mask_array(lines: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    out = lines
    for pattern, repl in MASK_RULES:
        out = pc.replace_substring_regex(out, pattern=pattern, replacement=repl)
    return out


def add_masked(batch: pa.Table, line_col: str = "line",
               out_col: str = "masked") -> pa.Table:
    """map_batches stage: append the normalized ``masked`` column."""
    return batch.append_column(out_col, mask_array(batch.column(line_col)))


def strip_header_array(lines: pa.Array | pa.ChunkedArray):
    """Header-strip + whitespace-normalize WITHOUT masking values —
    used by the param-extraction path, which needs original tokens
    aligned with masked/template tokens."""
    out = pc.replace_substring_regex(lines, pattern=MASK_RULES[0][0], replacement="")
    out = pc.replace_substring_regex(out, pattern=r"\s+", replacement=" ")
    return pc.replace_substring_regex(out, pattern=r"^ +| +$",
                                      replacement="")


def oracle_mask_sql(col: str) -> str:
    """DuckDB expression computing exactly :func:`mask_array`."""
    expr = col
    for pattern, repl in MASK_RULES:
        # DuckDB single-quoted literals are not backslash-escaped: the
        # RE2 pattern string passes through verbatim.
        p = pattern.replace("'", "''")
        r = repl.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{r}', 'g')"
    return expr

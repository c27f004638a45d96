"""Masking chain: Ray/Arrow result must equal the DuckDB oracle
expression byte-for-byte (same RE2 patterns on both sides)."""

import duckdb
import pyarrow as pa

from log_analysis_ai_ray import synth
from log_analysis_ai_ray.stages import explode, masking


def test_mask_basic():
    lines = pa.array([
        "[2025-01-01 00:00:00] INFO Server started on port 8080",
        "GET /api/v1/orders/123 200 45ms",
        "WARN High CPU usage detected: 93.5 percent",
        "ptr 0xDEADbeef and 10.0.0.1 here",
        "  spaced   out  ",
    ])
    got = masking.mask_array(lines).to_pylist()
    assert got == [
        "INFO Server started on port <*>",
        "GET /api/v<*>/orders/<*> <*> <*>ms",
        "WARN High CPU usage detected: <*> percent",
        "ptr <*> and <*> here",
        "spaced out",
    ]


def test_mask_matches_duckdb_oracle():
    pages = synth.generate_shard(0, 0, 300)
    lines = explode.explode_lines(pages)
    ours = masking.mask_array(lines["line"]).to_pylist()

    con = duckdb.connect()
    con.register("lines_tbl", lines.select(["line"]))
    expr = masking.oracle_mask_sql("line")
    theirs = [r[0] for r in con.execute(
        f"SELECT {expr} FROM lines_tbl").fetchall()]
    assert ours == theirs


def test_strip_header_preserves_tokens():
    lines = pa.array(["[x] a  b   c", "no header 9"])
    got = masking.strip_header_array(lines).to_pylist()
    assert got == ["a b c", "no header 9"]

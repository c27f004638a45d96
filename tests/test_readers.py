import json
import os

import pyarrow as pa
import pytest

from log_analysis_ai_ray.sources import readers


@pytest.fixture()
def jsonl_file(tmp_path):
    """Mirror of the reference's only fixture shape
    (/root/reference/python/samples/sample_logs.jsonl)."""
    rows = [
        {"timestamp": "2023-05-10T12:00:01", "level": "INFO",
         "message": "Server started on port 8080", "port": 8080},
        {"timestamp": "2023-05-10T12:00:02", "level": "ERROR",
         "message": "Failed to connect", "db_host": "db01"},
        {"time": "2023-05-10 12:00:03", "severity": "WARN",
         "msg": "fallback keys", "cpu_usage": 93.5},
        {"message": "no level or time"},
    ]
    p = tmp_path / "logs.jsonl"
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return str(p)


def test_read_json_logs_heuristics(ray_session, jsonl_file):
    out = readers.read_json_logs(jsonl_file).take_all()
    by_msg = {r["message"]: r for r in out}
    assert set(by_msg) == {
        "Server started on port 8080", "Failed to connect",
        "fallback keys", "no level or time"}
    assert by_msg["Server started on port 8080"]["level"] == "INFO"
    assert by_msg["Failed to connect"]["level"] == "ERROR"
    assert by_msg["fallback keys"]["level"] == "WARN"
    assert by_msg["no level or time"]["level"] == "INFO"  # default
    assert by_msg["Server started on port 8080"]["ts"] is not None
    assert by_msg["fallback keys"]["ts"] is not None
    assert by_msg["no level or time"]["ts"] is None
    # scalars stringified into the attrs map
    assert dict(by_msg["Server started on port 8080"]["attrs"])["port"] == "8080"
    assert dict(by_msg["fallback keys"]["attrs"])["cpu_usage"] == "93.5"


def test_read_csv_logs_dimensions(ray_session, tmp_path):
    p = tmp_path / "logs.csv"
    p.write_text(
        "when,what,sev,extra\n"
        "2024-01-01 10:00:00,started,INFO,x\n"
        "2024-01-01 10:00:01,crashed,ERROR,y\n")
    out = readers.read_csv_logs(
        str(p),
        dimensions={"body": "what", "timestamp": "when", "severity": "sev"},
    ).take_all()
    assert [r["message"] for r in out] == ["started", "crashed"]
    assert [r["level"] for r in out] == ["INFO", "ERROR"]
    assert out[0]["ts"].hour == 10
    assert [r["extra"] for r in out] == ["x", "y"]  # extras ride along


def test_read_text_lines(ray_session, tmp_path):
    # multiset comparison: Ray's streaming executor runs with
    # preserve_order=False, so tiny multi-block reads may surface
    # blocks in completion order (observed flake) — line identity, not
    # global order, is the reader's contract (order-sensitive
    # consumers key on line_no / per-file offsets)
    p = tmp_path / "plain.log"
    p.write_text("alpha\nbeta\n")
    out = readers.read_text_lines(str(p)).take_all()
    assert sorted(r["line"] for r in out) == ["alpha", "beta"]


def test_read_text_lines_gz_and_mixed(ray_session, tmp_path):
    """.gz files decompress through the same line-reader path; a mixed
    compressed/uncompressed list unions into one Dataset."""
    import gzip

    from log_analysis_ai_ray.sources.readers import read_text_lines

    plain = tmp_path / "a.log"
    plain.write_text("alpha 1\nalpha 2\n")
    gz = tmp_path / "b.log.gz"
    with gzip.open(gz, "wt") as f:
        f.write("beta 1\nbeta 2\nbeta 3\n")

    only_gz = read_text_lines([str(gz)])
    rows = sorted(r["line"] for r in only_gz.take_all())
    assert rows == ["beta 1", "beta 2", "beta 3"]

    mixed = read_text_lines([str(plain), str(gz)])
    rows = sorted(r["line"] for r in mixed.take_all())
    assert rows == ["alpha 1", "alpha 2", "beta 1", "beta 2", "beta 3"]


def test_read_text_lines_bz2_zlib(ray_session, tmp_path):
    """bz2 (Arrow codec) and raw zlib (custom inflate branch) both
    decompress through read_text_lines, and a three-codec mixed list
    unions — full parity with the reference's extension dispatch
    (gz/bz2/zlib, src/file_data_loader.cpp:93-116)."""
    import bz2
    import gzip
    import zlib

    from log_analysis_ai_ray.sources.readers import read_text_lines

    content = ("2025-01-01 00:00:01 ERROR disk full\n"
               "2025-01-01 00:00:02 INFO retry ok\n"
               "\n"
               "2025-01-01 00:00:03 WARN slow\n")
    expect = sorted(ln for ln in content.splitlines() if ln)

    bz = tmp_path / "a.log.bz2"
    bz.write_bytes(bz2.compress(content.encode()))
    zl = tmp_path / "b.log.zlib"
    zl.write_bytes(zlib.compress(content.encode()))
    gz = tmp_path / "c.log.gz"
    with gzip.open(gz, "wt") as f:
        f.write(content)

    for p in (bz, zl):
        rows = sorted(r["line"] for r in
                      read_text_lines(str(p)).take_all())
        assert rows == expect, p

    mixed = read_text_lines([str(bz), str(zl), str(gz)])
    rows = sorted(r["line"] for r in mixed.take_all())
    assert rows == sorted(expect * 3)


def test_schema_evolution_read(ray_session, tmp_path):
    """Heterogeneous parquet schemas (a column added mid-corpus — the
    normal life of a long-lived ingest directory) unify on read:
    missing columns surface as nulls, not errors. Pins the behavior
    the ingestion layer relies on."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    pq.write_table(pa.table({"a": [1, 2], "b": ["x", "y"]}),
                   str(tmp_path / "f1.parquet"))
    pq.write_table(pa.table({"a": [3], "b": ["z"], "c": [9.5]}),
                   str(tmp_path / "f2.parquet"))
    t = ray.data.read_parquet(str(tmp_path)).to_pandas().sort_values("a")
    assert list(t.a) == [1, 2, 3]
    assert t.c.isna().tolist() == [True, True, False]
    assert t.c.iloc[2] == 9.5

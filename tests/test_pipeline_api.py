import json

from log_analysis_ai_ray.pipeline import Pipeline, PipelineConfig


def test_config_roundtrip():
    cfg = PipelineConfig(source={"format": "pages", "path": "/x"},
                         parser={"kind": "drain"},
                         route={"out_dir": "/y", "num_sinks": 8})
    cfg2 = PipelineConfig.from_json(cfg.to_json())
    assert cfg2.source == cfg.source
    assert cfg2.route == cfg.route


def test_flagship_via_pipeline_api(ray_session, pages_small, tmp_path):
    cfg = PipelineConfig(
        source={"format": "pages", "path": pages_small},
        parser={"kind": "drain"},
        route={"out_dir": str(tmp_path / "out"), "num_sinks": 8},
    )
    res = Pipeline(cfg).run()
    assert res["metrics"]["rows_routed"] > 0
    assert res["registry"].num_rows == 25
    assert len(res["manifest"]["per_sink_rows"]) <= 8


def test_text_source_with_udf(ray_session, tmp_path):
    p = tmp_path / "x.log"
    p.write_text("one 1\ntwo 2\n")

    import pyarrow as pa
    import pyarrow.compute as pc

    def upper_udf(batch: pa.Table) -> pa.Table:
        return batch.append_column("upper",
                                   pc.ascii_upper(batch.column("line")))

    cfg = PipelineConfig(source={"format": "text", "path": str(p)},
                         parser={"kind": "line"},
                         extra_stages=[upper_udf])
    out = Pipeline(cfg).run()["dataset"].take_all()
    assert [r["upper"] for r in out] == ["ONE 1", "TWO 2"]


def test_cli_synth_and_flagship(tmp_path):
    from log_analysis_ai_ray import cli

    pages_dir = str(tmp_path / "pages")
    assert cli.main(["synth", "--out", pages_dir, "--pages", "300",
                     "--files", "2"]) == 0


def test_config_parquet_source_with_named_transforms(ray_session, tmp_path):
    """JSON-only config drives the text-analysis stage family over a
    generic parquet source (no Python callables needed)."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from log_analysis_ai_ray.pipeline import Pipeline, PipelineConfig

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": pa.array(["hello world of text", "the quick brown fox",
                          "der hund ist da"], type=pa.string()),
    })
    src = tmp_path / "docs.parquet"
    pq.write_table(docs, src)

    cfg_json = json.dumps({
        "source": {"format": "parquet", "path": str(src),
                   "columns": ["doc_id", "text"]},
        "parser": {"kind": "line"},
        "transforms": [{"kind": "quality"}],
        "route": {"out_dir": str(tmp_path / "out")},
    })
    cfg = PipelineConfig.from_json(cfg_json)
    out = Pipeline(cfg).run()
    rows = {r["doc_id"]: r for r in out["dataset"].take_all()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["n_tokens"] == 4
    assert (tmp_path / "out").exists()


def test_config_unknown_transform_raises(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from log_analysis_ai_ray.pipeline import Pipeline, PipelineConfig

    src = tmp_path / "d.parquet"
    pq.write_table(pa.table({"doc_id": pa.array([1], type=pa.int64()),
                             "text": pa.array(["x"])}), src)
    cfg = PipelineConfig(
        source={"format": "parquet", "path": str(src)},
        parser={"kind": "line"},
        transforms=[{"kind": "nonsense"}])
    with pytest.raises(ValueError, match="unknown transform"):
        Pipeline(cfg).run()


def test_run_curation_end_to_end(ray_session, tmp_path):
    import json
    import os

    import pyarrow as pa
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from log_analysis_ai_ray.pipelines.curation import run_curation

    base = ("the quick brown fox jumps over the lazy dog and keeps "
            "running through the wide open field every day")
    docs = [
        base,                      # kept
        base,                      # exact duplicate -> dropped
        base.upper().replace(" ", "  "),  # normalized duplicate -> dropped
        "short",                   # fails min_tokens
        "el zorro salta sobre el perro perezoso cada dia sin parar "
        "por el campo abierto",    # non-en -> dropped
        "a completely different english document about data engines "
        "and their streaming executors working on arrow batches",
    ]
    src = str(tmp_path / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(docs)), type=pa.int64()),
        "text": pa.array(docs, type=pa.string())}), src)

    out = str(tmp_path / "curated")
    m = run_curation(src, out, drop_near_dups=False)
    assert m["input_rows"] == 6
    assert m["kept_after_dedup"] == 2  # doc 0 and doc 5
    got = pads.dataset(os.path.join(out, "docs"),
                       partitioning="hive").to_table()
    assert sorted(got.column("doc_id").to_pylist()) == [0, 5]
    assert got.num_rows == m["kept_after_dedup"]
    saved = json.load(open(os.path.join(out, "_metrics.json")))
    assert saved == m
    # re-run overwrites, never duplicates
    m2 = run_curation(src, out, drop_near_dups=False)
    got2 = pads.dataset(os.path.join(out, "docs"),
                        partitioning="hive").to_table()
    assert got2.num_rows == m2["kept_after_dedup"] == 2


def test_config_normalize_and_pii_transforms(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from log_analysis_ai_ray.pipeline import Pipeline, PipelineConfig

    src = str(tmp_path / "d.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": pa.array(["Peer 10.0.0.1 said  HI", "clean row"])}), src)
    cfg = PipelineConfig.from_json(PipelineConfig(
        source={"format": "parquet", "path": src},
        parser={"kind": "line"},
        transforms=[{"kind": "pii_redact"}, {"kind": "normalize"}],
        aggregates=[]).to_json())
    res = Pipeline(cfg).run()
    rows = sorted(res["dataset"].take_all(), key=lambda r: r["doc_id"])
    assert rows[0]["text"] == "Peer <IP> said  HI"
    assert rows[0]["n_redactions"] == 1
    assert rows[0]["normalized"] == "peer <ip> said hi"
    assert rows[1]["n_redactions"] == 0


def test_config_chunk_transform(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from log_analysis_ai_ray.pipeline import Pipeline, PipelineConfig

    src = str(tmp_path / "c.parquet")
    toks = " ".join(f"w{i}" for i in range(10))
    pq.write_table(pa.table({
        "doc_id": pa.array([7, 8], type=pa.int64()),
        "text": pa.array([toks, "solo"])}), src)
    cfg = PipelineConfig.from_json(PipelineConfig(
        source={"format": "parquet", "path": src},
        parser={"kind": "line"},
        transforms=[{"kind": "chunk", "width": 4, "stride": 3}],
        aggregates=[]).to_json())
    res = Pipeline(cfg).run()
    rows = sorted(res["dataset"].take_all(),
                  key=lambda r: (r["doc_id"], r["chunk_idx"]))
    # doc 7: 10 tokens, width 4 stride 3 -> starts 0,3,6,9
    d7 = [r for r in rows if r["doc_id"] == 7]
    assert [r["chunk_idx"] for r in d7] == [0, 1, 2, 3]
    assert [r["n_chunk_tokens"] for r in d7] == [4, 4, 4, 1]
    assert d7[0]["first_token"] == "w0" and d7[0]["last_token"] == "w3"
    assert d7[3]["first_token"] == "w9" and d7[3]["last_token"] == "w9"
    d8 = [r for r in rows if r["doc_id"] == 8]
    assert len(d8) == 1 and d8[0]["n_chunk_tokens"] == 1


def test_cli_query_command(ray_session, capsys):
    import json

    from log_analysis_ai_ray.cli import main

    # --list needs no Ray work and prints the registry names
    assert main(["query", "--list"]) == 0
    names = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "level_counts" in names and len(names) >= 150
    # run a real query over the sf0.001 tables
    assert main(["query", "--name", "events_trend_slope",
                 "--sf", "/root/testdata/sf0.001"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == 5
    assert out["columns"] == ["event_type", "n", "slope_cents_per_day"]
    # unknown name is a clean error
    assert main(["query", "--name", "nope"]) == 2

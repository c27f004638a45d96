"""Per-file Bloom skipping index: build fan-out, pruned point
lookups (files read << files total), exactness of the residual, and
no-false-negative coverage for every stored key."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from log_analysis_ai_ray.stages import aggregate as agg
from log_analysis_ai_ray.stages import skipindex


def _mk_store(tmp_path, n_files=12, rows_per=200):
    """Sequential ids split across files (one id lives in exactly one
    file — the needle-lookup layout)."""
    root = str(tmp_path / "bstore")
    os.makedirs(root)
    for f in range(n_files):
        base = f * rows_per
        t = pa.table({
            "event_id": pa.array(
                [base + i for i in range(rows_per)], type=pa.int64()),
            "payload": pa.array(
                [f"p{base + i}" for i in range(rows_per)]),
        })
        pq.write_table(t, os.path.join(root, f"part-{f:03d}.parquet"))
    return root


def test_bloom_manifest_and_pruned_lookup(ray_session, tmp_path):
    root = _mk_store(tmp_path)
    out = skipindex.write_bloom_manifest(root, "event_id")
    meta = pq.read_table(out)
    assert meta.num_rows == 12
    assert sorted(meta.column_names) == ["bloom", "k_hashes", "m_bits",
                                         "n_keys", "path"]

    # 3 needles in 3 distinct files -> at most 3 + fp files read
    keys = [5, 405, 1805]
    ds, n_read, n_total = skipindex.bloom_pruned_read(
        root, "event_id", keys, columns=["event_id", "payload"])
    assert n_total == 12
    assert 3 <= n_read <= 5  # fpp ~1e-4 at 200 keys/16KiB filter
    got = agg._to_arrow(ds).sort_by([("event_id", "ascending")])
    assert got.column("event_id").to_pylist() == keys
    assert got.column("payload").to_pylist() == ["p5", "p405", "p1805"]


def test_bloom_never_false_negative(ray_session, tmp_path):
    root = _mk_store(tmp_path, n_files=4, rows_per=50)
    skipindex.write_bloom_manifest(root, "event_id")
    # every stored key must survive pruning (bloom FNs are impossible)
    rng = np.random.default_rng(7)
    keys = rng.choice(200, size=25, replace=False).tolist()
    ds, n_read, _ = skipindex.bloom_pruned_read(
        root, "event_id", keys, columns=["event_id"])
    got = sorted(agg._to_arrow(ds).column("event_id").to_pylist())
    assert got == sorted(keys)


def test_bloom_miss_reads_nothing(ray_session, tmp_path):
    root = _mk_store(tmp_path, n_files=4, rows_per=50)
    skipindex.write_bloom_manifest(root, "event_id")
    ds, n_read, n_total = skipindex.bloom_pruned_read(
        root, "event_id", [10_000_000, 20_000_000])
    assert ds is None and n_read == 0 and n_total == 4

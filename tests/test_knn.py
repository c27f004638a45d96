import numpy as np
import pyarrow as pa
import pytest

from log_analysis_ai_ray.stages import knn


def _embeddings(n=200, d=16, seed=7):
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((n, d)).astype(np.float32)
    return pa.table({
        "vec_id": pa.array(np.arange(n), type=pa.int64()),
        "embedding": pa.array([row.tolist() for row in M],
                              type=pa.list_(pa.float32())),
    }), M


def test_brute_force_matches_numpy(ray_session):
    import ray.data

    t, M = _embeddings()
    q = M[:2].astype(np.float64)
    ds = ray.data.from_arrow(t).repartition(4)
    out = knn.brute_force_topk(ds, [0, 1], q, k=5)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    Qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    sims = Mn @ Qn.T
    for qi in (0, 1):
        expect = set(np.argsort(-sims[:, qi])[:5].tolist())
        got = {v for qq, v in zip(out["query_id"].to_pylist(),
                                  out["vec_id"].to_pylist()) if qq == qi}
        assert got == expect
    # self-similarity 1.0 ranked first
    first = out.to_pylist()[0]
    assert first["vec_id"] == 0 and abs(first["sim"] - 1.0) < 1e-9


def test_lsh_recall_vs_brute_force(ray_session):
    import ray.data

    t, M = _embeddings(n=400)
    q = M[:3].astype(np.float64)
    ds = ray.data.from_arrow(t).repartition(4)
    exact = knn.brute_force_topk(ds, [0, 1, 2], q, k=10)
    approx = knn.lsh_topk(ds, [0, 1, 2], q, dim=M.shape[1], k=10)
    # the query vector itself always shares its own bucket → present
    for qi in (0, 1, 2):
        a = {v for qq, v in zip(approx["query_id"].to_pylist(),
                                approx["vec_id"].to_pylist()) if qq == qi}
        e = {v for qq, v in zip(exact["query_id"].to_pylist(),
                                exact["vec_id"].to_pylist()) if qq == qi}
        assert qi in a
        recall = len(a & e) / len(e)
        assert recall >= 0.3  # approximate, but far above chance (10/400)


def test_batch_matrix_zero_copy_shape():
    t, M = _embeddings(n=10, d=4)
    out = knn._batch_matrix(t["embedding"])
    assert out.shape == (10, 4)
    np.testing.assert_allclose(out, M.astype(np.float64), rtol=1e-6)


def test_embedding_near_dups(ray_session):
    import ray.data
    from log_analysis_ai_ray.stages.knn import embedding_near_dups

    rng = np.random.default_rng(3)
    M = rng.standard_normal((100, 12)).astype(np.float32)
    # plant near-dups: 50≈51 (tiny noise), 60==61 (identical)
    M[51] = M[50] + 0.01 * rng.standard_normal(12).astype(np.float32)
    M[61] = M[60]
    t = pa.table({
        "vec_id": pa.array(np.arange(100), type=pa.int64()),
        "embedding": pa.array([r.tolist() for r in M],
                              type=pa.list_(pa.float32())),
    })
    ds = ray.data.from_arrow(t).repartition(4)
    pairs = embedding_near_dups(ds, threshold=0.95)
    got = {(a, b) for a, b in zip(pairs["id_a"].to_pylist(),
                                  pairs["id_b"].to_pylist())}
    assert (60, 61) in got  # identical vectors always share a bucket
    assert (50, 51) in got  # near-identical → same sign pattern
    # deterministic across block structures
    pairs2 = embedding_near_dups(ray.data.from_arrow(t).repartition(9),
                                 threshold=0.95)
    assert pairs.equals(pairs2)


def test_ivf_recall_vs_brute_force(ray_session):
    import ray.data
    from log_analysis_ai_ray.stages.knn import ivf_topk

    t, M = _embeddings(n=400)
    q = M[:3].astype(np.float64)
    ds = ray.data.from_arrow(t).repartition(4)
    exact = knn.brute_force_topk(ds, [0, 1, 2], q, k=10)
    approx = ivf_topk(ds, [0, 1, 2], q, k=10, n_centroids=8, nprobe=3)
    for qi in (0, 1, 2):
        a = {v for qq, v in zip(approx["query_id"].to_pylist(),
                                approx["vec_id"].to_pylist()) if qq == qi}
        e = {v for qq, v in zip(exact["query_id"].to_pylist(),
                                exact["vec_id"].to_pylist()) if qq == qi}
        assert qi in a  # the query's own cell is always probed
        assert len(a & e) / len(e) >= 0.3


def test_embedding_near_dups_hot_bucket_bounded(ray_session):
    """A bucket flooded with one popular vector direction must be
    sub-salted (bucket cap) so the in-bucket O(n²) cosine stays bounded;
    dups that land in the same sub-bucket are still found."""
    import time

    import ray.data
    from log_analysis_ai_ray.stages.knn import embedding_near_dups

    rng = np.random.default_rng(11)
    base = rng.standard_normal(16)
    n = 3000
    # every vector is base + tiny noise → all share one LSH bucket
    M = base[None, :] + 0.001 * rng.standard_normal((n, 16))
    t = pa.table({
        "vec_id": pa.array(np.arange(n), type=pa.int64()),
        "embedding": pa.array([r.tolist() for r in M.astype(np.float32)],
                              type=pa.list_(pa.float32())),
    })
    start = time.monotonic()
    pairs = embedding_near_dups(ray.data.from_arrow(t).repartition(4),
                                threshold=0.999, max_bucket=500)
    elapsed = time.monotonic() - start
    assert elapsed < 90
    # sub-salting keeps pair volume well below the uncapped
    # C(3000,2) = 4.5M all-pairs — and plenty of dups survive
    assert 0 < pairs.num_rows < (3000 * 2999) // 2 // 3
    # determinism across block structure with the cap active
    pairs2 = embedding_near_dups(ray.data.from_arrow(t).repartition(7),
                                 threshold=0.999, max_bucket=500)
    assert pairs.equals(pairs2)


def test_embed_near_dups_groupby_path_matches(ray_session, monkeypatch):
    """The distributed groupby branch of embedding_near_dups (candidate
    sets too big for the single-task sweep) must match the small path."""
    import ray.data
    from log_analysis_ai_ray.stages import knn as knn_mod
    from log_analysis_ai_ray.stages.knn import embedding_near_dups

    rng = np.random.default_rng(21)
    M = rng.standard_normal((120, 8)).astype(np.float32)
    M[11] = M[10]
    M[21] = M[20] + 0.01 * rng.standard_normal(8).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(np.arange(len(M)), type=pa.int64()),
        "embedding": pa.array([r.tolist() for r in M],
                              type=pa.list_(pa.float32())),
    })
    ds = ray.data.from_arrow(t).repartition(4)
    expected = embedding_near_dups(ds, threshold=0.95)
    monkeypatch.setattr(knn_mod, "EMBED_SWEEP_MAX_BYTES", 0)
    forced = embedding_near_dups(ds, threshold=0.95)
    assert expected.equals(forced)

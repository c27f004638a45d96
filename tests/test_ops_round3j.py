"""Kernel-level semantics for the round-3j additions: Kendall tau-b
histogram closure, Poisson-bootstrap weight determinism, quantile
normalization mapping, Mann-Kendall S/variance. (Oracle parity for the
full queries is covered by the driver / tools/selfcheck.py.)"""

import math

import numpy as np


def _tau_b_bruteforce(x, y):
    n = len(x)
    C = D = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = int(x[j] > x[i]) - int(x[j] < x[i])
            dy = int(y[j] > y[i]) - int(y[j] < y[i])
            if dx * dy > 0:
                C += 1
            elif dx * dy < 0:
                D += 1
    n0 = n * (n - 1) // 2
    n1 = sum(t * (t - 1) // 2 for t in
             np.unique(x, return_counts=True)[1])
    n2 = sum(t * (t - 1) // 2 for t in
             np.unique(y, return_counts=True)[1])
    return (C - D) / (math.sqrt(n0 - n1) * math.sqrt(n0 - n2))


def _tau_b_histogram(x, y):
    """Mirror of q_kendall_tau_qty_discount's cell-pair closure."""
    cells = {}
    for a, b in zip(x, y):
        cells[(int(a), int(b))] = cells.get((int(a), int(b)), 0) + 1
    q = np.array([k[0] for k in cells], dtype=np.int64)
    d = np.array([k[1] for k in cells], dtype=np.int64)
    c = np.array(list(cells.values()), dtype=np.int64).astype(object)
    gt_q = q[:, None] < q[None, :]
    gt_d = d[:, None] < d[None, :]
    lt_d = d[:, None] > d[None, :]
    prod = c[:, None] * c[None, :]
    C = int((prod * (gt_q & gt_d)).sum())
    D = int((prod * (gt_q & lt_d)).sum())
    n = int(sum(cells.values()))
    n0 = n * (n - 1) // 2
    n1 = sum(int(t) * (t - 1) // 2 for t in
             [sum(v for (a, _), v in cells.items() if a == u)
              for u in set(q.tolist())])
    n2 = sum(int(t) * (t - 1) // 2 for t in
             [sum(v for (_, b), v in cells.items() if b == u)
              for u in set(d.tolist())])
    return (C - D) / (math.sqrt(n0 - n1) * math.sqrt(n0 - n2))


def test_kendall_histogram_matches_bruteforce():
    rng = np.random.default_rng(5)
    x = rng.integers(1, 7, 120)
    y = (2 * x + rng.integers(0, 6, 120)) % 8
    assert abs(_tau_b_bruteforce(x, y)
               - _tau_b_histogram(x, y)) < 1e-12


def _poisson_w(ids, B=50):
    """Mirror of q_bootstrap_mean_ci's weight kernel."""
    T = (367879, 735758, 919698, 981011)
    hb = ((np.asarray(ids, dtype=np.int64)[:, None] * B
           + np.arange(B)[None, :]).astype(np.uint64)
          % np.uint64(2**32) * np.uint64(2654435761)) \
        % np.uint64(2**32) % np.uint64(1_000_000)
    return (np.int64(4) - (hb < T[3]).astype(np.int64)
            - (hb < T[2]).astype(np.int64)
            - (hb < T[1]).astype(np.int64)
            - (hb < T[0]).astype(np.int64))


def test_bootstrap_weights_deterministic_and_poisson_like():
    ids = np.arange(10_000)
    w = _poisson_w(ids)
    w2 = _poisson_w(ids)
    assert (w == w2).all()
    # Poisson(1)-ish: mean near 1, ~36.8% zeros
    assert abs(w.mean() - 1.0) < 0.02
    z = (w == 0).mean()
    assert 0.35 < z < 0.385
    assert w.max() <= 4


def test_quantile_normalize_midrank_maps_to_global_order_stat():
    # Each source's cell at within-source midrank q maps to the global
    # order statistic at the same quantile position (hand-checked).
    vals = {"A": [1, 1, 2], "B": [10, 20, 30]}
    allv = np.sort(np.concatenate([vals["A"], vals["B"]]))
    N = len(allv)
    want = {"A": [1, 20], "B": [1, 2, 20]}
    for s, v in vals.items():
        v = np.asarray(sorted(v))
        uv, cnt = np.unique(v, return_counts=True)
        cb = np.cumsum(cnt) - cnt
        ns = cnt.sum()
        idx = ((2 * cb + cnt - 1) * N) // (2 * ns)
        mapped = allv[idx]
        assert (np.diff(mapped) >= 0).all()
        assert mapped.tolist() == want[s]


def test_mann_kendall_s_and_variance():
    x = np.array([3, 1, 4, 1, 5, 9, 2, 6], dtype=np.int64)
    S = 0
    for i in range(len(x)):
        for j in range(i + 1, len(x)):
            S += int(np.sign(x[j] - x[i]))
    sgn = np.sign(x[None, :] - x[:, None])
    S_vec = int(np.triu(sgn, 1).sum())
    assert S == S_vec
    n = len(x)
    _, tc = np.unique(x, return_counts=True)
    var_num = n * (n - 1) * (2 * n + 5) - sum(
        int(t) * (t - 1) * (2 * t + 5) for t in tc)
    # one tie pair (two 1s): n=8 -> 8*7*21 - 2*1*9 = 1176 - 18
    assert var_num == 1158


def test_vad_segments_exact_on_constructed_clip():
    import pyarrow as pa

    from log_analysis_ai_ray.stages.multimodal import (VadStage,
                                                       make_wav)

    # 20 frames: 5 loud, 2 quiet, 4 loud, 1 quiet, 2 loud (short),
    # rest quiet -> segments (>=3 voiced): [5, 4]; longest run 5
    frame = 160
    pat = [1] * 5 + [0] * 2 + [1] * 4 + [0] * 1 + [1] * 2 + [0] * 6
    samples = np.concatenate([
        (np.full(frame, 8000, dtype=np.int16) if v
         else np.zeros(frame, dtype=np.int16)) for v in pat])
    t = pa.table({
        "media_id": pa.array([1], pa.int64()),
        "kind": pa.array(["audio"], pa.string()),
        "payload": pa.array([make_wav(samples)], pa.binary()),
    })
    out = VadStage()(t).to_pylist()[0]
    assert out["total_frames"] == 20
    assert out["voiced_frames"] == 11
    assert out["n_segments"] == 2
    assert out["longest_run"] == 5


def test_vad_threshold_boundary_is_strict():
    import pyarrow as pa

    from log_analysis_ai_ray.stages.multimodal import (VadStage,
                                                       make_wav)

    frame = 160
    # amplitude exactly at the threshold: energy == thresh^2 * n,
    # strict > means NOT voiced
    samples = np.full(frame * 3, 2000, dtype=np.int16)
    t = pa.table({
        "media_id": pa.array([1], pa.int64()),
        "kind": pa.array(["audio"], pa.string()),
        "payload": pa.array([make_wav(samples)], pa.binary()),
    })
    out = VadStage(thresh=2000)(t).to_pylist()[0]
    assert out["voiced_frames"] == 0


def test_otsu_bimodal_image_exact():
    import pyarrow as pa

    from log_analysis_ai_ray.stages.multimodal import (OtsuStage,
                                                       make_pgm)

    # two clean modes at 50 and 200: any threshold in [50, 199]
    # separates them; the integer argmax with lowest-t ties must pick
    # t = 50 (first maximizer: all in-gap thresholds give identical
    # separation)
    px = np.array([[50] * 8 * 4 + [200] * 8 * 4],
                  dtype=np.uint8).reshape(8, 8)
    t = pa.table({
        "media_id": pa.array([1], pa.int64()),
        "kind": pa.array(["image"], pa.string()),
        "payload": pa.array([make_pgm(8, 8, px)], pa.binary()),
    })
    out = OtsuStage()(t).to_pylist()[0]
    assert out["otsu_thresh"] == 50
    assert out["fg_fraction_pm"] == 500


def test_otsu_uniform_image_degenerate():
    import pyarrow as pa

    from log_analysis_ai_ray.stages.multimodal import (OtsuStage,
                                                       make_pgm)

    px = np.full((4, 4), 99, dtype=np.uint8)
    t = pa.table({
        "media_id": pa.array([2], pa.int64()),
        "kind": pa.array(["image"], pa.string()),
        "payload": pa.array([make_pgm(4, 4, px)], pa.binary()),
    })
    out = OtsuStage()(t).to_pylist()[0]
    # no split improves separation -> threshold stays at init 0,
    # everything is foreground (px > 0)
    assert out["otsu_thresh"] == 0
    assert out["fg_fraction_pm"] == 1000

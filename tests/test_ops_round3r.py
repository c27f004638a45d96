"""Brute-force verification of the round-3r driver closures:
Chatterjee's xi, the KMV/theta sketch, and the D'Agostino-Pearson K²
transforms, each checked against independent textbook implementations
on constructed + randomized inputs."""

import math

import numpy as np

from log_analysis_ai_ray.pipelines.queries_ext4 import (
    _KMV_K, _TWO64, chatterjee_xi, dagostino_k2, kmv_bottom_k,
    kmv_estimate, splitmix64_np)


# ---------------------------------------------------------------------------
# Chatterjee's xi
# ---------------------------------------------------------------------------


def _xi_naive(x, y):
    """Direct O(n²) transcription of Chatterjee (2020) eq. 1.2 with
    index tie-break in x."""
    n = len(x)
    order = sorted(range(n), key=lambda i: (x[i], i))
    ys = [y[i] for i in order]
    r = [sum(1 for v in y if v <= ys[i]) for i in range(n)]
    l = [sum(1 for v in y if v >= ys[i]) for i in range(n)]
    num = n * sum(abs(r[i + 1] - r[i]) for i in range(n - 1))
    den = 2 * sum(v * (n - v) for v in l)
    return num, den, (None if den == 0 else 1.0 - num / den)


def test_xi_matches_bruteforce_with_ties():
    rng = np.random.RandomState(7)
    for _ in range(25):
        n = int(rng.randint(5, 60))
        x = rng.randint(0, 8, n).astype(np.int64)
        y = rng.randint(0, 8, n).astype(np.int64)
        assert chatterjee_xi(x, y) == _xi_naive(list(x), list(y))


def test_xi_perfect_monotone_exact():
    # no ties, y strictly increasing in x: xi = (n-2)/(n+1) exactly
    for n in (5, 20, 101):
        x = np.arange(n, dtype=np.int64)
        num, den, xi = chatterjee_xi(x, 3 * x + 1)
        assert num == n * (n - 1) and den == (n ** 3 - n) // 3
        assert math.isclose(xi, (n - 2) / (n + 1), rel_tol=1e-12)
        # strictly decreasing gives the same value
        _, _, xi2 = chatterjee_xi(x, -2 * x)
        assert xi2 == xi


def test_xi_constant_y_is_none():
    x = np.arange(10, dtype=np.int64)
    num, den, xi = chatterjee_xi(x, np.zeros(10, dtype=np.int64))
    assert den == 0 and xi is None


def test_xi_detects_nonmonotone_dependence():
    # v-shape: Pearson ~ 0 but xi must be near its maximum
    n = 201
    x = np.arange(-100, 101, dtype=np.int64)
    y = np.abs(x)
    _, _, xi = chatterjee_xi(x, y)
    assert xi > 0.8
    # independence: xi near 0
    rng = np.random.RandomState(11)
    _, _, xi0 = chatterjee_xi(
        np.arange(2000, dtype=np.int64),
        rng.randint(0, 10 ** 6, 2000).astype(np.int64))
    assert abs(xi0) < 0.08


def test_xi_invariant_under_monotone_x_transform():
    rng = np.random.RandomState(3)
    x = rng.permutation(50).astype(np.int64)
    y = rng.randint(0, 20, 50).astype(np.int64)
    a = chatterjee_xi(x, y)
    b = chatterjee_xi(x * 7 + 3, y)     # strictly monotone, no ties
    assert a == b


# ---------------------------------------------------------------------------
# KMV / theta sketch
# ---------------------------------------------------------------------------


def test_kmv_merge_invariant():
    rng = np.random.RandomState(5)
    a = splitmix64_np(rng.randint(0, 10 ** 9, 4000)
                      .astype(np.uint64))
    b = splitmix64_np(rng.randint(0, 10 ** 9, 4000)
                      .astype(np.uint64))
    direct = kmv_bottom_k(np.concatenate([a, b]))
    merged = kmv_bottom_k(np.concatenate([kmv_bottom_k(a),
                                          kmv_bottom_k(b)]))
    assert np.array_equal(direct, merged)


def test_kmv_small_set_exact():
    h = np.sort(splitmix64_np(np.arange(100, dtype=np.uint64)))
    theta, est = kmv_estimate(h)
    assert theta == _TWO64 and est == 100.0


def test_kmv_estimate_accuracy():
    # 50k distinct ids, k=256 -> relative error ~ 1/sqrt(k-2) ≈ 6%
    ids = np.arange(50_000, dtype=np.uint64) * np.uint64(2654435761)
    h = np.sort(np.unique(splitmix64_np(ids)))
    theta, est = kmv_estimate(h[:_KMV_K])
    assert abs(est - 50_000) / 50_000 < 0.25


def test_kmv_duplicate_invariance():
    rng = np.random.RandomState(9)
    ids = rng.randint(0, 5000, 30_000).astype(np.uint64)
    h_dup = kmv_bottom_k(splitmix64_np(ids))
    h_uni = kmv_bottom_k(splitmix64_np(np.unique(ids)))
    assert np.array_equal(h_dup, h_uni)


# ---------------------------------------------------------------------------
# D'Agostino-Pearson K²
# ---------------------------------------------------------------------------


def _moments(xs):
    n = len(xs)
    return (n, sum(xs), sum(v * v for v in xs),
            sum(v ** 3 for v in xs), sum(v ** 4 for v in xs))


def test_dagostino_g1_b2_match_numpy():
    rng = np.random.RandomState(13)
    xs = [int(v) for v in rng.randint(100, 10_000, 400)]
    g1, b2, z1, z2, k2 = dagostino_k2(*_moments(xs))
    a = np.asarray(xs, dtype=np.float64)
    m = a.mean()
    m2 = ((a - m) ** 2).mean()
    m3 = ((a - m) ** 3).mean()
    m4 = ((a - m) ** 4).mean()
    assert abs(g1 - m3 / m2 ** 1.5) < 1e-9
    assert abs(b2 - m4 / m2 ** 2) < 1e-9


def test_dagostino_symmetric_zero_skew():
    # exactly symmetric sample -> g1 == 0 -> Z1 == 0 (asinh(0) = 0)
    xs = list(range(-50, 51)) * 3
    g1, b2, z1, z2, k2 = dagostino_k2(*_moments(xs))
    assert abs(g1) < 1e-12 and abs(z1) < 1e-9


def test_dagostino_normalish_small_k2():
    # binomial(60, .5) is near-normal: K² should be modest and the
    # transforms finite
    rng = np.random.RandomState(17)
    xs = [int(v) for v in rng.binomial(60, 0.5, 5000)]
    g1, b2, z1, z2, k2 = dagostino_k2(*_moments(xs))
    assert k2 < 12.0
    assert abs(b2 - 3.0) < 0.4


def test_dagostino_heavy_tail_flags():
    # one extreme outlier inflates kurtosis -> large Z2 and K²
    xs = [100] * 400 + [105] * 400 + [10_000]
    g1, b2, z1, z2, k2 = dagostino_k2(*_moments(xs))
    assert b2 > 100 and k2 > 50.0


def test_dagostino_z2_direction():
    # platykurtic (uniform, b2≈1.8) -> negative Z2;
    # leptokurtic -> positive Z2
    uni = list(range(1000))
    _, b2u, _, z2u, _ = dagostino_k2(*_moments(uni))
    assert b2u < 2.0 and z2u < 0
    lep = [0] * 900 + [1000, -1000] * 5
    _, b2l, _, z2l, _ = dagostino_k2(*_moments(lep))
    assert b2l > 10 and z2l > 0

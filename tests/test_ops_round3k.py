"""Kernel-level semantics for the round-3k additions: VaR/CVaR tail
split, coordinated-sample join-size estimator, Gini mean difference,
Otsu vs float reference."""

import numpy as np


def _var_cvar_hist(values, counts, q=95):
    v = np.asarray(values, dtype=np.int64)
    c = np.asarray(counts, dtype=np.int64)
    o = np.argsort(v)
    v, c = v[o], c[o]
    n = int(c.sum())
    k = -(-q * n // 100)
    cum = np.cumsum(c)
    i = int(np.searchsorted(cum, k, side="left"))
    var = int(v[i])
    tail_n = n - k + 1
    full = c[i + 1:]
    tail_sum = int((v[i + 1:] * full).sum()) \
        + var * (tail_n - int(full.sum()))
    return var, tail_sum // tail_n


def test_var_cvar_matches_flat_computation():
    rng = np.random.default_rng(2)
    xs = rng.integers(0, 500, 977)
    v, c = np.unique(xs, return_counts=True)
    var, cvar = _var_cvar_hist(v, c)
    flat = np.sort(xs)
    n = len(flat)
    k = -(-95 * n // 100)
    assert var == flat[k - 1]
    assert cvar == int(flat[k - 1:].sum()) // (n - k + 1)


def test_join_size_estimate_unbiased_over_buckets():
    # summing the per-bucket estimates over ALL 16 buckets recovers
    # the exact size 16x16/16 = exactly (each key in exactly one
    # bucket)
    rng = np.random.default_rng(9)
    keys = np.arange(1000, dtype=np.int64)
    lc = rng.integers(1, 5, 1000).astype(np.int64)
    oc = rng.integers(1, 3, 1000).astype(np.int64)
    exact = int((lc * oc).sum())
    from log_analysis_ai_ray.pipelines.queries import _knuth_bucket
    b = _knuth_bucket(keys, 16)
    total = 0
    for j in range(16):
        total += 16 * int((lc[b == j] * oc[b == j]).sum())
    assert total == 16 * exact


def test_gini_mean_difference_matches_pairwise():
    rng = np.random.default_rng(4)
    xs = rng.integers(1, 30, 150)
    v, c = np.unique(xs, return_counts=True)
    vo, co = v.astype(object), c.astype(object)
    s = int((np.abs(vo[:, None] - vo[None, :])
             * (co[:, None] * co[None, :])).sum())
    n = len(xs)
    brute = sum(abs(int(a) - int(b)) for a in xs for b in xs)
    assert s == brute
    gmd = s * 1_000_000 // (n * (n - 1))
    assert gmd > 0

"""Brute-force verification of the round-3s driver closures: the
dictionary/RLE encoding audit helpers, the equi-width selectivity
estimator, and the feature-hashing audit — each checked against direct
transcriptions on constructed + randomized inputs."""

import numpy as np

from log_analysis_ai_ray.functions.hashing import md5_hash32
from log_analysis_ai_ray.pipelines.queries_ext5 import (
    _FH_BUCKETS, bin_lo, bin_width_exact, dict_bits, feature_hash_stats,
    rle_runs_from, selectivity_estimate)

# ---------------------------------------------------------------------------
# dict_encoding_audit helpers
# ---------------------------------------------------------------------------


def test_dict_bits_textbook():
    assert dict_bits(1) == 1
    assert dict_bits(2) == 1
    assert dict_bits(3) == 2
    assert dict_bits(4) == 2
    assert dict_bits(5) == 3
    assert dict_bits(256) == 8
    assert dict_bits(257) == 9


def test_rle_runs_handcrafted():
    # groups: [a a b] [c] [d d] -> changes: 1 (a->b), runs = 3 groups + 1
    assert rle_runs_from(1, 3) == 4
    # constant column in one group: 0 changes, 1 run
    assert rle_runs_from(0, 1) == 1


def _runs_naive(groups):
    """Direct run count over a list of per-group value sequences."""
    runs = changes = 0
    for g in groups:
        runs += 1
        for a, b in zip(g, g[1:]):
            if a != b:
                changes += 1
                runs += 1
    return changes, runs


def test_runs_identity_random():
    rng = np.random.RandomState(11)
    for _ in range(50):
        groups = [list(rng.randint(0, 3, rng.randint(1, 8)))
                  for _ in range(rng.randint(1, 10))]
        changes, runs = _runs_naive(groups)
        assert rle_runs_from(changes, len(groups)) == runs


# ---------------------------------------------------------------------------
# selectivity estimator
# ---------------------------------------------------------------------------


def test_bin_widths_partition_domain():
    # widths of all bins must sum to the domain size, lo must be the
    # first value mapped to each bin, for many domain sizes
    for rng_sz in [1, 5, 63, 64, 65, 1000, 12345]:
        tot = sum(bin_width_exact(b, rng_sz, 64) for b in range(64))
        assert tot == rng_sz
        for b in range(64):
            lo = bin_lo(b, 0, rng_sz, 64)
            w = bin_width_exact(b, rng_sz, 64)
            if w > 0:
                assert (lo * 64) // rng_sz == b
                assert ((lo + w - 1) * 64) // rng_sz == b
                if lo + w < rng_sz:
                    # next value lands past b (possibly skipping
                    # empty bins when the domain is tiny)
                    assert ((lo + w) * 64) // rng_sz > b


def test_selectivity_exact_on_uniform():
    # a perfectly uniform distribution is estimated EXACTLY by the
    # uniform-within-bin interpolation at every threshold
    mn, mx = 100, 100 + 64 * 10 - 1   # 640 values, 10 per bin
    vals = np.arange(mn, mx + 1)
    hist = {}
    for v in vals:
        b = (v - mn) * 64 // (mx - mn + 1)
        hist[b] = hist.get(b, 0) + 1
    for x in [mn, mn + 7, (mn + mx) // 2, mx - 1, mx]:
        est = selectivity_estimate(hist, mn, mx, x)
        exact = int((vals <= x).sum())
        assert abs(est - exact) < 1e-9


def test_selectivity_bounded_by_bin_mass():
    # estimate error is at most the threshold bin's own count
    rng = np.random.RandomState(3)
    vals = rng.randint(0, 1000, 5000)
    mn, mx = int(vals.min()), int(vals.max())
    hist = {}
    for v in vals:
        b = (int(v) - mn) * 64 // (mx - mn + 1)
        hist[b] = hist.get(b, 0) + 1
    for x in [mn + 10, 250, 500, 750, mx - 10]:
        est = selectivity_estimate(hist, mn, mx, x)
        exact = int((vals <= x).sum())
        bx = (x - mn) * 64 // (mx - mn + 1)
        assert abs(est - exact) <= hist.get(bx, 0)


# ---------------------------------------------------------------------------
# feature hashing
# ---------------------------------------------------------------------------


def test_feature_hash_no_collision_identity():
    # distinct tokens that land in distinct buckets: occupied ==
    # distinct, zero collisions, and the sketch probe is EXACT
    toks = {}
    seen = set()
    i = 0
    while len(toks) < 20:
        t = f"tok{i}"
        b = md5_hash32(t) % _FH_BUCKETS
        if b not in seen:
            seen.add(b)
            toks[t] = 10 + len(toks)
        i += 1
    d, occ, coll, mx, top, exact, est = feature_hash_stats(toks)
    assert d == 20 and occ == 20 and coll == 0 and mx == 1
    assert est == exact == toks[top]
    assert toks[top] == max(toks.values())


def test_feature_hash_forced_collision_cancellation():
    # force two tokens into one bucket: the probe bias is exactly
    # +/- the colliding token's count, by the signs
    base = "anchor"
    hb = md5_hash32(base) % _FH_BUCKETS
    other = None
    i = 0
    while other is None:
        t = f"x{i}"
        if t != base and md5_hash32(t) % _FH_BUCKETS == hb:
            other = t
        i += 1
    counts = {base: 1000, other: 7}
    d, occ, coll, mx, top, exact, est = feature_hash_stats(counts)
    assert d == 2 and occ == 1 and coll == 1 and mx == 2
    assert top == base and exact == 1000
    s_b = 1 if (md5_hash32(base) // _FH_BUCKETS) % 2 == 0 else -1
    s_o = 1 if (md5_hash32(other) // _FH_BUCKETS) % 2 == 0 else -1
    assert est == 1000 + s_b * s_o * 7


def test_feature_hash_top_tiebreak_lexicographic():
    counts = {"bb": 5, "aa": 5, "cc": 4}
    _, _, _, _, top, exact, _ = feature_hash_stats(counts)
    assert top == "aa" and exact == 5

"""Brute-force verification of the round-3s driver closures: the
dictionary/RLE encoding audit helpers, the equi-width selectivity
estimator, and the feature-hashing audit — each checked against direct
transcriptions on constructed + randomized inputs."""

import math

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


# ---------------------------------------------------------------------------
# Lin's CCC / Bland-Altman / agreement coefficients
# ---------------------------------------------------------------------------

from log_analysis_ai_ray.pipelines.queries_ext5 import (  # noqa: E402
    agreement_coeffs, bland_altman, lin_ccc)


def _sums(x, y):
    n = len(x)
    return (n, int(sum(x)), int(sum(y)), int(sum(v * v for v in x)),
            int(sum(v * v for v in y)),
            int(sum(a * b for a, b in zip(x, y))))


def test_lin_ccc_identity_and_shift():
    x = [3, 1, 4, 1, 5, 9, 2, 6]
    ccc, r, cb = lin_ccc(*_sums(x, x))
    assert abs(ccc - 1.0) < 1e-12 and abs(r - 1.0) < 1e-12
    y = [v + 10 for v in x]          # pure shift: r = 1, ccc < 1
    ccc, r, cb = lin_ccc(*_sums(x, y))
    assert abs(r - 1.0) < 1e-12 and ccc < 0.2 and abs(cb - ccc) < 1e-12


def test_lin_ccc_matches_float_reference():
    rng = np.random.RandomState(5)
    for _ in range(20):
        n = int(rng.randint(5, 50))
        x = rng.randint(0, 100, n).astype(int).tolist()
        y = rng.randint(0, 100, n).astype(int).tolist()
        ccc, r, cb = lin_ccc(*_sums(x, y))
        xa, ya = np.array(x, float), np.array(y, float)
        sxy = ((xa - xa.mean()) * (ya - ya.mean())).mean()
        ref = 2 * sxy / (xa.var() + ya.var()
                         + (xa.mean() - ya.mean()) ** 2)
        assert abs(ccc - ref) < 1e-9


def test_bland_altman_matches_numpy():
    rng = np.random.RandomState(9)
    d = rng.randint(-20, 20, 40)
    md, sd, lo, hi = bland_altman(len(d), int(d.sum()),
                                  int((d * d).sum()))
    assert abs(md - d.mean()) < 1e-12
    assert abs(sd - d.std(ddof=1)) < 1e-9
    assert abs(lo - (d.mean() - 1.96 * d.std(ddof=1))) < 1e-9
    assert abs(hi - (d.mean() + 1.96 * d.std(ddof=1))) < 1e-9


def _agree_float(cells):
    """Independent probability-form transcription of the three
    coefficients."""
    s = sum(cells.values())
    po = sum(v for (a, b), v in cells.items() if a == b) / s
    t, p = {}, {}
    for (a, b), v in cells.items():
        t[a] = t.get(a, 0) + v
        p[b] = p.get(b, 0) + v
    ks = sorted(set(t) | set(p))
    pik = {k: (t.get(k, 0) + p.get(k, 0)) / (2 * s) for k in ks}
    pe_scott = sum(v * v for v in pik.values())
    scott = (po - pe_scott) / (1 - pe_scott)
    kk = len(ks)
    pe_g = sum(v * (1 - v) for v in pik.values()) / (kk - 1)
    ac1 = (po - pe_g) / (1 - pe_g)
    q = 2 * s
    qs = {k: t.get(k, 0) + p.get(k, 0) for k in ks}
    pe_a = sum(v * (v - 1) for v in qs.values()) / (q * (q - 1))
    alpha = 1 - (1 - po) / (1 - pe_a)
    return scott, ac1, alpha


def test_agreement_coeffs_match_float_reference():
    rng = np.random.RandomState(2)
    for _ in range(20):
        cats = ["en", "de", "fr"]
        cells = {}
        for a in cats:
            for b in cats:
                v = int(rng.randint(0, 30))
                base = 60 if a == b else 0
                if v + base:
                    cells[(a, b)] = v + base
        s, c, scott, ac1, alpha = agreement_coeffs(cells)
        es, eg, ea = _agree_float(cells)
        assert abs(scott - es) < 1e-9
        assert abs(ac1 - eg) < 1e-9
        assert abs(alpha - ea) < 1e-9


def test_agreement_perfect_is_one():
    cells = {("en", "en"): 10, ("de", "de"): 5}
    s, c, scott, ac1, alpha = agreement_coeffs(cells)
    assert s == 15 and c == 15
    assert scott == 1.0 and ac1 == 1.0 and alpha == 1.0


# ---------------------------------------------------------------------------
# Cucconi / Brunner-Munzel / Bartels RVN
# ---------------------------------------------------------------------------

from log_analysis_ai_ray.pipelines.queries_ext5 import (  # noqa: E402
    bartels_rvn, brunner_munzel_from_hists, cucconi_from_hists)


def _hists_from(x, y):
    vals = sorted(set(x) | set(y))
    cx = [sum(1 for v in x if v == u) for u in vals]
    cy = [sum(1 for v in y if v == u) for u in vals]
    return cx, cy


def _cucconi_naive(x, y):
    """Direct transcription of Cucconi (1968) with midranks."""
    import math as m
    pool = sorted(x + y)
    n = len(pool)
    nx, ny = len(x), len(y)

    def midrank(v):
        lo = sum(1 for p in pool if p < v)
        eq = sum(1 for p in pool if p == v)
        return lo + (eq + 1) / 2.0

    s1 = sum(midrank(v) ** 2 for v in x)
    s2 = sum((n + 1 - midrank(v)) ** 2 for v in x)
    den = m.sqrt(nx * ny * (n + 1) * (2 * n + 1) * (8 * n + 11) / 5.0)
    u = (6 * s1 - nx * (n + 1) * (2 * n + 1)) / den
    v = (6 * s2 - nx * (n + 1) * (2 * n + 1)) / den
    rho = 2.0 * (n * n - 4) / ((2 * n + 1) * (8 * n + 11)) - 1.0
    c = (u * u + v * v - 2 * rho * u * v) / (2 * (1 - rho * rho))
    return u, v, c


def test_cucconi_matches_naive():
    rng = np.random.RandomState(4)
    for _ in range(20):
        x = rng.randint(0, 12, rng.randint(5, 25)).tolist()
        y = rng.randint(0, 12, rng.randint(5, 25)).tolist()
        cx, cy = _hists_from(x, y)
        u, v, c, p = cucconi_from_hists(cx, cy)
        eu, ev, ec = _cucconi_naive(x, y)
        assert abs(u - eu) < 1e-9 and abs(v - ev) < 1e-9
        assert abs(c - ec) < 1e-9
        assert abs(p - np.exp(-ec)) < 1e-12


def test_cucconi_symmetric_under_exchange():
    # identical samples: U and V are equal by symmetry of the
    # midranks, and C is small
    x = list(range(20))
    cx, cy = _hists_from(x, x)
    u, v, c, p = cucconi_from_hists(cx, cy)
    assert abs(u - v) < 1e-12


def _bm_naive(x, y):
    """Direct transcription of Brunner-Munzel (2000) / scipy's
    brunnermunzel with midranks."""
    import math as m
    nx, ny = len(x), len(y)
    pool = x + y

    def midrank(seq, v):
        lo = sum(1 for p in seq if p < v)
        eq = sum(1 for p in seq if p == v)
        return lo + (eq + 1) / 2.0

    rcx = [midrank(pool, v) for v in x]
    rcy = [midrank(pool, v) for v in y]
    rx = [midrank(x, v) for v in x]
    ry = [midrank(y, v) for v in y]
    mx, my = sum(rcx) / nx, sum(rcy) / ny
    sx = sum((rcx[i] - rx[i] - mx + (nx + 1) / 2.0) ** 2
             for i in range(nx)) / (nx - 1)
    sy = sum((rcy[i] - ry[i] - my + (ny + 1) / 2.0) ** 2
             for i in range(ny)) / (ny - 1)
    n = nx + ny
    w = nx * ny * (my - mx) / (n * m.sqrt(nx * sx + ny * sy))
    p_hat = (my - (ny + 1) / 2.0) / nx
    vx, vy = nx * sx, ny * sy
    df = (vx + vy) ** 2 / (vx ** 2 / (nx - 1) + vy ** 2 / (ny - 1))
    return p_hat, w, df


def test_brunner_munzel_matches_naive():
    rng = np.random.RandomState(6)
    for _ in range(20):
        x = rng.randint(0, 10, rng.randint(6, 30)).tolist()
        y = (rng.randint(0, 10, rng.randint(6, 30)) * 2).tolist()
        cx, cy = _hists_from(x, y)
        p_hat, w, df = brunner_munzel_from_hists(cx, cy)
        ep, ew, edf = _bm_naive(x, y)
        assert abs(p_hat - ep) < 1e-9
        assert abs(w - ew) < 1e-9
        assert abs(df - edf) < 1e-6


def test_brunner_munzel_phat_stochastic_order():
    # y strictly larger than every x -> p_hat = 1
    x = [1, 2, 3]
    y = [10, 11]
    cx, cy = _hists_from(x, y)
    p_hat, w, df = brunner_munzel_from_hists(cx, cy)
    assert abs(p_hat - 1.0) < 1e-12


def test_bartels_rvn_known_values():
    # monotone sequence: every rank step is 1, numerator minimal ->
    # RVN well below 2 (strong positive serial correlation)
    n = 30
    dmid = [2 * (i + 1) for i in range(n)]   # doubled ranks, no ties
    rvn, z, var = bartels_rvn(dmid)
    num = sum((2.0) ** 2 for _ in range(n - 1))       # (2R step)^2
    den = sum((2 * (i + 1) - (n + 1)) ** 2 for i in range(n))
    assert abs(rvn - num / den) < 1e-12
    assert z < -5.0
    # alternating extremes: numerator huge -> RVN > 2, z > 0
    order = []
    lo, hi = 1, n
    for i in range(n):
        order.append(hi if i % 2 else lo)
        if i % 2:
            hi -= 1
        else:
            lo += 1
    dm = [2 * r for r in order]
    rvn2, z2, _ = bartels_rvn(dm)
    assert rvn2 > 2.0 and z2 > 3.0


def test_bartels_rvn_var_formula():
    n = 25
    var_expected = (4.0 * (n - 2) * (5 * n * n - 2 * n - 9)
                    / (5.0 * n * (n + 1) * (n - 1) ** 2))
    _, _, var = bartels_rvn([2 * (i + 1) for i in range(n)])
    assert abs(var - var_expected) < 1e-15


# ---------------------------------------------------------------------------
# White / Goldfeld-Quandt / Dickey-Fuller
# ---------------------------------------------------------------------------

from log_analysis_ai_ray.pipelines.queries_ext5 import (  # noqa: E402
    dickey_fuller, ols_ssr, white_lm)


def test_ols_ssr_matches_lstsq():
    rng = np.random.RandomState(8)
    for _ in range(15):
        n = int(rng.randint(6, 40))
        x = rng.randint(0, 50, n).astype(int)
        if len(set(x.tolist())) < 2:
            continue
        y = (3 * x + rng.randint(-9, 9, n)).astype(int)
        A = np.vstack([np.ones(n), x]).T
        res = np.linalg.lstsq(A, y.astype(float), rcond=None)
        fit = A @ res[0]
        ssr_ref = float(((y - fit) ** 2).sum())
        got = ols_ssr(n, int(x.sum()), int(y.sum()),
                      int((x * x).sum()), int((x * y).sum()),
                      int((y * y).sum()))
        assert abs(got - ssr_ref) < 1e-6 * max(1.0, ssr_ref)


def _white_naive(xs, ys):
    """Aux regression via numpy lstsq: LM = n*R² of e² on (1,x,x²)."""
    x = np.array(xs, float)
    y = np.array(ys, float)
    n = len(x)
    A = np.vstack([np.ones(n), x]).T
    beta = np.linalg.lstsq(A, y, rcond=None)[0]
    e2 = (y - A @ beta) ** 2
    B = np.vstack([np.ones(n), x, x * x]).T
    g = np.linalg.lstsq(B, e2, rcond=None)[0]
    ssr = float(((e2 - B @ g) ** 2).sum())
    sst = float(((e2 - e2.mean()) ** 2).sum())
    r2 = 1 - ssr / sst
    return n * r2, r2


def test_white_lm_matches_lstsq():
    rng = np.random.RandomState(13)
    for _ in range(10):
        n = int(rng.randint(20, 60))
        xs = list(range(n))
        # heteroskedastic data: noise grows with x
        ys = [int(100 + 5 * i + rng.randint(-3 - i, 4 + i))
              for i in xs]
        lm, r2, p = white_lm(xs, ys)
        elm, er2 = _white_naive(xs, ys)
        assert abs(lm - elm) < 1e-6
        assert abs(r2 - er2) < 1e-9
        assert abs(p - np.exp(-lm / 2)) < 1e-12


def test_white_detects_planted_heteroskedasticity():
    rng = np.random.RandomState(21)
    n = 200
    xs = list(range(n))
    homo = [int(1000 + 3 * i + rng.randint(-50, 51)) for i in xs]
    hetero = [int(1000 + 3 * i
                  + rng.randint(-1 - i, 2 + i)) for i in xs]
    lm_h, _, p_h = white_lm(xs, homo)
    lm_x, _, p_x = white_lm(xs, hetero)
    assert lm_x > lm_h and p_x < 0.01


def test_dickey_fuller_stationary_vs_walk():
    rng = np.random.RandomState(17)
    # strongly mean-reverting AR(1): gamma near -0.8, t very negative
    y = [0.0]
    for _ in range(300):
        y.append(0.2 * y[-1] + rng.randint(-10, 11))
    yi = [int(round(v)) for v in y]
    u = yi[:-1]
    v = [b - a for a, b in zip(yi[:-1], yi[1:])]
    gamma, t = dickey_fuller(u, v)
    assert gamma < -0.5 and t < -8
    # pure random walk: gamma near 0, |t| small
    w = np.cumsum(rng.randint(-10, 11, 300)).tolist()
    u2 = w[:-1]
    v2 = [b - a for a, b in zip(w[:-1], w[1:])]
    g2, t2 = dickey_fuller(u2, v2)
    assert abs(g2) < 0.2 and t2 > -4


# ---------------------------------------------------------------------------
# Laplace trend / Crow-AMSAA / Ulcer / spectral entropy
# ---------------------------------------------------------------------------

from log_analysis_ai_ray.pipelines.queries_ext5 import (  # noqa: E402
    crow_amsaa_beta, laplace_trend, spectral_entropy, ulcer_index)


def test_laplace_trend_uniform_is_zero():
    # perfectly uniform arrivals: centroid = T/2 exactly -> z = 0
    big_t = 1000
    ts = [100, 300, 500, 700, 900]
    z = laplace_trend(len(ts), sum(ts), big_t)
    assert abs(z) < 1e-12
    # late-crowded arrivals -> z > 0; early-crowded -> z < 0
    late = [800, 850, 900, 950, 990]
    early = [10, 50, 100, 150, 200]
    assert laplace_trend(5, sum(late), big_t) > 3
    assert laplace_trend(5, sum(early), big_t) < -3


def test_crow_amsaa_beta_recovers_power_law():
    # event times tᵢ = T·(i/n)^(1/β) are the exact quantiles of a
    # power-law NHPP: the MLE recovers β as n grows
    big_t = 1.0
    for beta_true in (0.5, 1.0, 2.0):
        n = 5000
        ts = [big_t * ((i + 0.5) / n) ** (1.0 / beta_true)
              for i in range(n)]
        sum_ln = sum(np.log(big_t / t) for t in ts)
        beta_hat = crow_amsaa_beta(n, sum_ln)
        assert abs(beta_hat - beta_true) < 0.05 * beta_true


def test_ulcer_index_cases():
    # monotone increasing: never below running max -> UI = 0
    ui, mx, mean = ulcer_index([1, 2, 3, 4, 5])
    assert ui == 0.0 and mx == 0.0 and mean == 3.0
    # one 50% dip for one of four days: dd = [0,50,0,0]
    ui2, mx2, _ = ulcer_index([100, 50, 100, 120])
    assert abs(mx2 - 50.0) < 1e-12
    assert abs(ui2 - np.sqrt(2500.0 / 4)) < 1e-12


def test_spectral_entropy_tone_vs_flat():
    n = 64
    # pure tone at k=2: entropy ~ 0, peak_k = 2
    tone = [int(1000 + 500 * np.cos(2 * np.pi * 2 * i / n))
            for i in range(n)]
    h, peak = spectral_entropy(tone)
    assert peak == 2 and h < 0.05
    # white-ish noise: entropy far from 0
    rng = np.random.RandomState(12)
    noise = rng.randint(0, 1000, n).tolist()
    h2, _ = spectral_entropy(noise)
    assert h2 > 0.6


def test_spectral_entropy_matches_fft():
    rng = np.random.RandomState(3)
    y = rng.randint(0, 100, 50).tolist()
    h, peak = spectral_entropy(y)
    f = np.fft.fft(np.array(y, float))
    p = (np.abs(f[1:9]) ** 2)
    q = p / p.sum()
    h_ref = float(-(q * np.log(q)).sum() / np.log(8))
    assert abs(h - h_ref) < 1e-9
    assert peak == int(np.argmax(p)) + 1


# ---------------------------------------------------------------------------
# Hoover/Palma, Getis-Ord G*, Ripley's K
# ---------------------------------------------------------------------------

from log_analysis_ai_ray.pipelines.queries_ext5 import (  # noqa: E402
    getis_ord_gstar, hoover_index, palma_ratio, ripley_pairs_circular)


def test_hoover_equal_zero_and_extreme():
    num, den = hoover_index([5, 5, 5, 5])
    assert num == 0
    # one person has everything: H = (n-1)/n
    num, den = hoover_index([0, 0, 0, 12])
    assert num / den == 3 / 4


def test_hoover_matches_naive():
    rng = np.random.RandomState(1)
    for _ in range(20):
        v = rng.randint(0, 100, rng.randint(3, 30)).tolist()
        if sum(v) == 0:
            continue
        num, den = hoover_index(v)
        tot = sum(v)
        naive = 0.5 * sum(abs(x / tot - 1 / len(v)) for x in v)
        assert abs(num / den - naive) < 1e-12


def test_palma_shares():
    vals = sorted(range(1, 21))   # 1..20, n=20 -> n10=2, n40=8
    top, bot = palma_ratio(vals, 2, 8)
    assert top == 19 + 20 and bot == sum(range(1, 9))


def test_gstar_flat_grid_zero_and_spike():
    flat = np.full((7, 24), 10, dtype=np.int64)
    spike = flat.copy()
    spike[3, 12] = 500
    cells = getis_ord_gstar(spike)
    # the spike and its four rook neighbors all contain the spike
    # exactly once with W=5 -> they TIE for the top G*
    ranked = sorted(cells, key=lambda r: -r[2])[:5]
    coords = {(r[0], r[1]) for r in ranked}
    assert coords == {(4, 12), (4, 11), (4, 13), (3, 12), (5, 12)}
    assert ranked[0][2] > 5.0
    assert abs(ranked[0][2] - ranked[4][2]) < 1e-9


def test_gstar_mean_is_near_zero():
    rng = np.random.RandomState(7)
    g = rng.randint(0, 100, (7, 24)).astype(np.int64)
    cells = getis_ord_gstar(g)
    zs = [r[2] for r in cells]
    assert abs(np.mean(zs)) < 0.15


def test_ripley_pairs_bruteforce():
    rng = np.random.RandomState(5)
    minutes = rng.randint(0, 1440, 60)
    hist = np.zeros(1440, dtype=np.int64)
    for m in minutes:
        hist[m] += 1
    for r in (0, 5, 60, 700):
        brute = 0
        for i in range(60):
            for j in range(60):
                if i == j:
                    continue
                d = abs(int(minutes[i]) - int(minutes[j]))
                if min(d, 1440 - d) <= r:
                    brute += 1
        assert ripley_pairs_circular(hist, r) == brute


def test_ripley_all_pairs_at_max_radius():
    hist = np.zeros(1440, dtype=np.int64)
    hist[3] = 4
    hist[1000] = 6
    n = 10
    assert ripley_pairs_circular(hist, 719) == n * (n - 1)


# ---------------------------------------------------------------------------
# TextRank / Craig's Zeta / HD-D
# ---------------------------------------------------------------------------

from math import comb  # noqa: E402

from log_analysis_ai_ray.pipelines.queries_ext5 import (  # noqa: E402
    craig_zeta, hdd_contrib)


def test_craig_zeta_extremes():
    # word in every A doc, no B doc -> zeta = +1; the reverse -> -1
    zs = dict((w, z) for w, a, b, z in craig_zeta(
        {"only_a": 10, "both": 5}, {"only_b": 10, "both": 5},
        10, 10, min_df=1))
    assert zs["only_a"] == 1.0
    assert zs["only_b"] == -1.0
    assert zs["both"] == 0.0


def test_craig_zeta_min_df_gate():
    out = craig_zeta({"rare": 2}, {"rare": 2}, 10, 10, min_df=5)
    assert out == []
    out2 = craig_zeta({"rare": 3}, {"rare": 2}, 10, 10, min_df=5)
    assert len(out2) == 1


def test_hdd_contrib_matches_hypergeometric():
    # exact absence probability C(N-n, s)/C(N, s)
    for big_n, n_i in [(100, 1), (100, 5), (500, 50), (60, 17)]:
        p_abs = comb(big_n - n_i, 42) / comb(big_n, 42)
        assert abs(hdd_contrib(n_i, big_n) - (1 - p_abs)) < 1e-12


def test_hdd_contrib_saturation():
    # a type with count > N - s is in EVERY 42-token sample
    assert hdd_contrib(60, 100) == 1.0
    # a corpus of one repeated type: HD-D = 1 (one type, certain)
    assert hdd_contrib(100, 100) == 1.0


# ---------------------------------------------------------------------------
# betweenness / effective size
# ---------------------------------------------------------------------------

from log_analysis_ai_ray.pipelines.queries_ext5 import (  # noqa: E402
    _BTW_SCALE, betweenness_micro, bfs_dist_sigma, effective_size)


def _adj(n, pairs):
    a = [[] for _ in range(n)]
    for x, y in pairs:
        a[x].append(y)
        a[y].append(x)
    return a


def test_betweenness_path_graph():
    # path 0-1-2-3-4: interior node 2 lies on (0,3),(0,4),(1,3),
    # (1,4),(0,... ) exactly: bc(2) = 4 pairs, bc(1) = bc(3) = 3
    n = 5
    pairs = [(0, 1), (1, 2), (2, 3), (3, 4)]
    bc = betweenness_micro(n, _adj(n, pairs), 6)
    assert bc == [0, 3 * _BTW_SCALE, 4 * _BTW_SCALE,
                  3 * _BTW_SCALE, 0]


def test_betweenness_star_graph():
    # star center: all (n-1 choose 2) pairs route through it
    n = 6
    pairs = [(0, i) for i in range(1, n)]
    bc = betweenness_micro(n, _adj(n, pairs), 6)
    assert bc[0] == 10 * _BTW_SCALE
    assert all(b == 0 for b in bc[1:])


def test_betweenness_cycle_split_paths():
    # 4-cycle: opposite corners have TWO shortest paths; each
    # intermediate carries sigma ratio 1/2 for one pair
    n = 4
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0)]
    bc = betweenness_micro(n, _adj(n, pairs), 6)
    assert bc == [_BTW_SCALE // 2] * 4


def test_bfs_sigma_counts():
    # diamond: 0-1, 0-2, 1-3, 2-3 -> two shortest paths 0->3
    adj = _adj(4, [(0, 1), (0, 2), (1, 3), (2, 3)])
    dist, sigma = bfs_dist_sigma(4, adj, 0, 6)
    assert dist == {0: 0, 1: 1, 2: 1, 3: 2}
    assert sigma[3] == 2


def test_effective_size_star_and_clique():
    # star center: no ties among neighbors -> ES = deg
    n = 5
    star = [(0, i) for i in range(1, n)]
    rows = {r[0]: r for r in effective_size(n, star)}
    assert rows[0][3] == 4 * 1_000_000
    # leaf: deg 1, ES = 1
    assert rows[1][3] == 1_000_000
    # K4: every ego network fully redundant -> ES = 1 for all
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    for _, deg, t, es in effective_size(4, k4):
        assert deg == 3 and t == 3 and es == 1_000_000


# ---------------------------------------------------------------------------
# Woolf / DP noise / Erlang B
# ---------------------------------------------------------------------------

from log_analysis_ai_ray.pipelines.queries_ext5 import (  # noqa: E402
    erlang_b_curve, laplace_noise, woolf_homogeneity)


def test_woolf_identical_strata_near_zero():
    # identical 2x2 tables in every stratum: lnORs equal -> chi2 = 0
    cells = [(20, 10, 10, 20)] * 5
    chi2, k = woolf_homogeneity(cells)
    assert k == 5 and abs(chi2) < 1e-12


def test_woolf_detects_reversed_stratum():
    cells = [(40, 10, 10, 40)] * 4 + [(10, 40, 40, 10)]
    chi2, k = woolf_homogeneity(cells)
    assert chi2 > 15          # wildly heterogeneous
    # df=4 closed-form tail is tiny
    p = np.exp(-chi2 / 2) * (1 + chi2 / 2)
    assert p < 0.01


def test_woolf_skips_empty_stratum():
    cells = [(20, 10, 10, 20), (0, 0, 0, 0), (20, 10, 10, 20)]
    chi2, k = woolf_homogeneity(cells)
    assert k == 2 and abs(chi2) < 1e-12


def test_laplace_noise_quantiles():
    # u = 0.5 -> 0; symmetric; known quantile: u=0.75 -> ln(2)/eps
    assert laplace_noise(0.5, 1.0) == 0.0
    assert abs(laplace_noise(0.75, 1.0) + np.log(0.5)) < 1e-12
    assert abs(laplace_noise(0.25, 1.0) - np.log(0.5)) < 1e-12
    assert laplace_noise(0.9, 0.1) == -laplace_noise(0.1, 0.1)
    # 95% of mass inside ln(20)/eps
    for u in (0.026, 0.974):
        assert abs(laplace_noise(u, 0.1)) <= np.log(20.0) / 0.1
    for u in (0.024, 0.976):
        assert abs(laplace_noise(u, 0.1)) > np.log(20.0) / 0.1


def test_erlang_b_matches_factorial_form():
    from math import factorial
    for a in (0.3, 1.0, 5.0, 12.5):
        bs = erlang_b_curve(a, 30)
        for c in (1, 2, 5, 20):
            num = a ** c / factorial(c)
            den = sum(a ** k / factorial(k) for k in range(c + 1))
            assert abs(bs[c] - num / den) < 1e-12


def test_erlang_b_monotone_decreasing():
    bs = erlang_b_curve(7.0, 60)
    assert all(b2 < b1 for b1, b2 in zip(bs, bs[1:]))


# ---------------------------------------------------------------------------
# Hu moments / spectral centroid / weighted kappa
# ---------------------------------------------------------------------------

from log_analysis_ai_ray.pipelines.queries_ext5 import (  # noqa: E402
    weighted_kappa_quadratic)
from log_analysis_ai_ray.stages.multimodal import (  # noqa: E402
    hu_moments_log, spectral_centroid_features)


def _blob(h, w, oy, ox, s):
    img = np.zeros((h, w), dtype=np.int64)
    img[oy:oy + s, ox:ox + s] = 200
    img[oy + s // 3: oy + 2 * s // 3, ox:ox + s // 2] = 40
    return img


def test_hu_translation_invariance_exact():
    a = hu_moments_log(_blob(64, 64, 5, 5, 20))
    b = hu_moments_log(_blob(64, 64, 30, 38, 20))
    assert a == b


def test_hu_scale_invariance_close():
    # same shape at 2x scale: normalized moments match to milli-log
    a = hu_moments_log(_blob(128, 128, 10, 10, 24))
    b = hu_moments_log(_blob(128, 128, 10, 10, 48))
    for x, y in zip(a, b):
        assert abs(x - y) <= 30     # 0.03 in log10 units


def test_hu_distinguishes_shapes():
    sq = np.zeros((64, 64), dtype=np.int64)
    sq[20:44, 20:44] = 100
    bar = np.zeros((64, 64), dtype=np.int64)
    bar[30:34, 4:60] = 100
    a, b = hu_moments_log(sq), hu_moments_log(bar)
    assert a != b
    # the square is fully symmetric: phi2 = 0 exactly (sentinel 0);
    # the bar's eccentricity gives a finite (negative-log) phi2
    assert a[1] == 0 and b[1] != 0


def test_spectral_centroid_pure_tone():
    rate = 8000
    n = 4000
    i = np.arange(n)
    # tone exactly at bin 4 of 16: f = 4*rate/32 = 1000 Hz
    tone = (1000 * np.sin(2 * np.pi * 1000.0 * i / rate))
    c, r = spectral_centroid_features(tone, rate)
    assert abs(c - 1000.0) < 20.0
    assert r <= 1250.0
    # brighter tone -> higher centroid
    hi = (1000 * np.sin(2 * np.pi * 3000.0 * i / rate))
    c2, _ = spectral_centroid_features(hi, rate)
    assert c2 > c + 1000


def test_weighted_kappa_perfect_and_reversed():
    perfect = {(i, i): 10 for i in range(4)}
    n, k = weighted_kappa_quadratic(perfect)
    assert n == 40 and k == 1.0
    reversed_ = {(i, 3 - i): 10 for i in range(4)}
    n, k2 = weighted_kappa_quadratic(reversed_)
    assert k2 < -0.5


def test_weighted_kappa_matches_probability_form():
    rng = np.random.RandomState(4)
    for _ in range(20):
        cells = {}
        for i in range(4):
            for j in range(4):
                v = int(rng.randint(0, 20)) + (30 if i == j else 0)
                if v:
                    cells[(i, j)] = v
        n, k = weighted_kappa_quadratic(cells)
        # independent transcription: 1 - sum(w o)/sum(w e)
        r = [sum(cells.get((i, j), 0) for j in range(4))
             for i in range(4)]
        c = [sum(cells.get((i, j), 0) for i in range(4))
             for j in range(4)]
        num = sum((i - j) ** 2 * cells.get((i, j), 0)
                  for i in range(4) for j in range(4)) / n
        den = sum((i - j) ** 2 * r[i] * c[j] / (n * n)
                  for i in range(4) for j in range(4))
        assert abs(k - (1 - num / den)) < 1e-9


# ---------------------------------------------------------------------------
# Hilbert locality / theta forecast / Katz+Petrosian FD
# ---------------------------------------------------------------------------

from log_analysis_ai_ray.pipelines.queries_ext5 import (  # noqa: E402
    curve_tables, hilbert_xy2d, katz_petrosian_fd, locality_audit,
    theta_forecast)


def test_hilbert_bijection_and_adjacency():
    n = 16
    seen = {}
    for x in range(n):
        for y in range(n):
            seen[hilbert_xy2d(n, x, y)] = (x, y)
    assert sorted(seen) == list(range(n * n))
    # the defining property: consecutive d are GRID NEIGHBORS
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = seen[d], seen[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_hilbert_beats_zorder_on_box_seeks():
    tabs = curve_tables()
    counts = {(x, y): 1 for x in range(16) for y in range(16)}
    res = {name: locality_audit(counts, curve, (4, 11))
           for name, curve in tabs.items()}
    # all layouts match the same 64 rows
    assert all(r[2] == 64 for r in res.values())
    # hilbert needs no more seek runs than z-order on this box
    assert res["hilbert"][1] <= res["zorder"][1]
    # scanned >= matched always
    for r in res.values():
        assert r[3] >= r[2]


def test_theta_forecast_recovers_linear_trend():
    # exact line: theta-2 residual line is ~0, forecast == the line
    y = [100 + 7 * t for t in range(50)]
    level, slope, ses = theta_forecast(y)
    assert abs(slope - 7) < 1e-9 and abs(level - 100) < 1e-6
    # the theta2 line z = 2y - trend equals the line itself here; an
    # SES lags a rising ramp by (1-a)/a steps of slope
    lag = (1 - 0.3) / 0.3 * 7
    assert abs(ses - (100 + 7 * 49 - lag)) < 0.01


def test_theta_ses_matches_recursion():
    rng = np.random.RandomState(3)
    y = rng.randint(50, 150, 40).tolist()
    level, slope, ses = theta_forecast(y)
    # independent recursion
    a = 0.3
    s = None
    for t, v in enumerate(y):
        z = 2 * v - (level + slope * t)
        s = z if s is None else a * z + (1 - a) * s
    assert abs(ses - s) < 1e-9


def test_katz_petrosian_known_profiles():
    # smooth monotone ramp: both near 1
    ramp = [10 * t for t in range(100)]
    k, p = katz_petrosian_fd(ramp)
    assert abs(p - 1.0) < 1e-9        # zero sign changes
    assert abs(k - 1.0) < 1e-9        # d == L exactly on a ramp
    # jagged noise: many sign flips, path length >> excursion
    rng = np.random.RandomState(2)
    noise = rng.randint(0, 1000, 200).tolist()
    k2, p2 = katz_petrosian_fd(noise)
    assert p2 > p and k2 > 1.5


# ---------------------------------------------------------------------------
# AD 2-sample / Cochran's C / Breusch-Godfrey
# ---------------------------------------------------------------------------

from log_analysis_ai_ray.pipelines.queries_ext5 import (  # noqa: E402
    ad_2samp_from_hists, breusch_godfrey_lm, cochran_c)


def _ad_naive(x, y):
    """Direct Scholz-Stephens midrank transcription (their eq. 7 for
    k samples, k=2)."""
    pooled = sorted(set(x + y))
    nx, ny = len(x), len(y)
    n = nx + ny
    total = 0.0
    for sample, na in ((x, nx), (y, ny)):
        inner = 0.0
        bprev = maprev = 0
        for v in pooled:
            lj = sum(1 for p in x + y if p == v)
            fj = sum(1 for p in sample if p == v)
            bbar = bprev + lj / 2.0
            mbar = maprev + fj / 2.0
            den = bbar * (n - bbar) - n * lj / 4.0
            if den > 0:
                inner += lj / n * (n * mbar - na * bbar) ** 2 / den
            bprev += lj
            maprev += fj
        total += inner / na
    return (n - 1.0) / n * total


def test_ad_2samp_matches_naive():
    rng = np.random.RandomState(8)
    for _ in range(15):
        x = rng.randint(0, 15, rng.randint(8, 30)).tolist()
        y = rng.randint(0, 15, rng.randint(8, 30)).tolist()
        vals = sorted(set(x) | set(y))
        cx = [sum(1 for v in x if v == u) for u in vals]
        cy = [sum(1 for v in y if v == u) for u in vals]
        got = ad_2samp_from_hists(cx, cy)
        assert abs(got - _ad_naive(x, y)) < 1e-9


def test_ad_2samp_separated_vs_same():
    same = list(range(20))
    cx = [1] * 20 + [0] * 20
    cy = [0] * 20 + [1] * 20     # fully separated
    a2_sep = ad_2samp_from_hists(cx, cy)
    cxs = [1] * 20
    a2_same = ad_2samp_from_hists(cxs, cxs)
    assert a2_sep > 5.0 and a2_same < 1.0


def test_cochran_c_uniform_and_outlier():
    # equal variances: C ~ 1/k
    g = {i: (10, 100, 1090) for i in range(5)}   # var = (10*1090-1e4)/90
    c, gmax, k = cochran_c(g)
    assert k == 5 and abs(c - 0.2) < 1e-12 and gmax == 0
    g[3] = (10, 100, 10000)   # blow up group 3's variance
    c2, gmax2, _ = cochran_c(g)
    assert gmax2 == 3 and c2 > 0.9


def test_breusch_godfrey_detects_ar1():
    rng = np.random.RandomState(11)
    n = 300
    xs = list(range(n))
    # white residuals: LM small
    y_w = [int(1000 + 5 * t + rng.randint(-50, 51)) for t in xs]
    lm_w, _, rho_w = breusch_godfrey_lm(xs, y_w)
    # strongly AR(1) residuals
    e = 0.0
    y_a = []
    for t in xs:
        e = 0.9 * e + rng.randint(-20, 21)
        y_a.append(int(1000 + 5 * t + e))
    lm_a, _, rho_a = breusch_godfrey_lm(xs, y_a)
    assert lm_a > 50 > lm_w
    assert rho_a > 0.6 and abs(rho_w) < 0.2


# ---------------------------------------------------------------------------
# Bloom FPR / CUSUM of squares / concentration index
# ---------------------------------------------------------------------------

from log_analysis_ai_ray.pipelines.queries_ext5 import (  # noqa: E402
    _BF_K, _BF_M, bloom_fpr_theory, bloom_positions, concentration_index,
    cusum_squares)


def test_bloom_positions_deterministic_and_in_range():
    for key in (0, 1, 12345, 999999):
        pos = bloom_positions(key)
        assert pos == bloom_positions(key)
        assert len(pos) == _BF_K
        assert all(0 <= p < _BF_M for p in pos)


def test_bloom_no_false_negatives_and_fpr_near_theory():
    rng = np.random.RandomState(5)
    members = set(rng.randint(0, 10 ** 9, 300).tolist())
    bits = set()
    for k in members:
        bits.update(bloom_positions(k))
    # no false negatives, ever
    for k in list(members)[:50]:
        assert all(p in bits for p in bloom_positions(k))
    probes = [int(v) for v in rng.randint(10 ** 9, 2 * 10 ** 9, 5000)]
    fp = sum(1 for k in probes
             if all(p in bits for p in bloom_positions(k)))
    fpr = fp / len(probes)
    theory = bloom_fpr_theory(len(members))
    assert 0.3 * theory < fpr < 3.0 * theory


def test_cusum_squares_uniform_vs_shift():
    rng = np.random.RandomState(2)
    flat = rng.normal(0, 1, 400).tolist()
    stat_flat, _ = cusum_squares(flat)
    shifted = (rng.normal(0, 0.3, 200).tolist()
               + rng.normal(0, 3.0, 200).tolist())
    stat_shift, t_at = cusum_squares(shifted)
    assert stat_shift > 0.3 > stat_flat
    # variance arrives LATE: the max deviation sits near the break
    assert 150 <= t_at <= 250


def test_concentration_index_extremes():
    # all outcome on the highest-ranked unit: CI -> (n-1)/n
    pairs = [(i, 0) for i in range(9)] + [(100, 50)]
    num, den = concentration_index(pairs)
    assert abs(num / den - 9 / 10) < 1e-12
    # outcome flat across ranks: CI = 0 exactly
    pairs2 = [(i, 7) for i in range(10)]
    num2, den2 = concentration_index(pairs2)
    assert num2 == 0
    # all outcome on the LOWEST-ranked: CI -> -(n-1)/n
    pairs3 = [(0, 50)] + [(i + 1, 0) for i in range(9)]
    num3, den3 = concentration_index(pairs3)
    assert abs(num3 / den3 + 9 / 10) < 1e-12


# ---------------------------------------------------------------------------
# TOST / Bayesian A/B / prefix compression
# ---------------------------------------------------------------------------

from log_analysis_ai_ray.pipelines.queries_ext5 import (  # noqa: E402
    bayes_prob_b_beats_a, common_prefix_len, tost_z)


def test_tost_identical_groups_equivalent():
    g = [100, 110, 90, 105, 95, 102, 98, 101] * 8
    d, se, delta, zl, zu = tost_z(
        len(g), sum(g), sum(v * v for v in g),
        len(g), sum(g), sum(v * v for v in g))
    assert d == 0.0 and zl == zu and zl > 1.645


def test_tost_large_difference_not_equivalent():
    g1 = [100] * 30 + [101, 99] * 5
    g2 = [200] * 30 + [201, 199] * 5
    d, se, delta, zl, zu = tost_z(
        len(g1), sum(g1), sum(v * v for v in g1),
        len(g2), sum(g2), sum(v * v for v in g2))
    assert not (zl > 1.645 and zu > 1.645)


def test_bayes_ab_symmetry_and_dominance():
    # symmetric data: exactly 0.5
    p = bayes_prob_b_beats_a(11, 91, 11, 91)
    assert abs(p - 0.5) < 1e-12
    # b clearly better
    p2 = bayes_prob_b_beats_a(11, 91, 31, 71)
    assert p2 > 0.99
    # complement identity: P(b>a) + P(a>b) = 1 (continuous posteriors)
    p3 = bayes_prob_b_beats_a(8, 15, 4, 21)
    p3r = bayes_prob_b_beats_a(4, 21, 8, 15)
    assert abs(p3 + p3r - 1.0) < 1e-10


def test_bayes_ab_matches_monte_carlo():
    rng = np.random.RandomState(0)
    a = rng.beta(12, 40, 200_000)
    b = rng.beta(18, 34, 200_000)
    mc = float((b > a).mean())
    exact = bayes_prob_b_beats_a(12, 40, 18, 34)
    assert abs(exact - mc) < 0.005


def test_common_prefix_len():
    assert common_prefix_len("", "abc") == 0
    assert common_prefix_len("abc", "abc") == 3
    assert common_prefix_len("abcdef", "abcxyz") == 3
    assert common_prefix_len("abc", "abcdef") == 3


# ---------------------------------------------------------------------------
# delta-of-delta audit / Fligner-Killeen / inverse normal
# ---------------------------------------------------------------------------

from log_analysis_ai_ray.pipelines.queries_ext5 import (  # noqa: E402
    dod_bucket, fligner_killeen, inv_phi_upper, zigzag)
from log_analysis_ai_ray.pipelines.queries_ext3 import phi_as  # noqa: E402


def test_zigzag_and_buckets():
    assert zigzag(0) == 0 and zigzag(1) == 2 and zigzag(-1) == 1
    assert dod_bucket(0) == ("b0", 1)
    assert dod_bucket(127) == ("b7", 9)
    assert dod_bucket(128) == ("b15", 18)
    assert dod_bucket(32767) == ("b15", 18)
    assert dod_bucket(32768) == ("b31", 34)
    assert dod_bucket(2 ** 31 - 1) == ("b31", 34)
    assert dod_bucket(2 ** 31) == ("b64", 66)


def test_dod_regular_stream_compresses_to_b0():
    # perfectly regular timestamps: dod = 0 everywhere
    ts = [1000 + 60 * i for i in range(100)]
    dods = [(ts[i] - ts[i - 1]) - (ts[i - 1] - ts[i - 2])
            for i in range(2, 100)]
    assert all(dod_bucket(zigzag(d))[0] == "b0" for d in dods)


def test_inv_phi_is_inverse_of_phi():
    for u in (0.5, 0.6, 0.75, 0.9, 0.97, 0.99, 0.999, 0.99999):
        x = inv_phi_upper(u)
        # round-trip through the shared A&S Phi (its own |err|<1.5e-7)
        assert abs(phi_as(x) - u) < 3e-7
    assert inv_phi_upper(0.5) == 0.0
    assert abs(inv_phi_upper(0.975) - 1.959964) < 1e-4


def test_fligner_killeen_equal_vs_unequal_scale():
    rng = np.random.RandomState(6)
    # equal-scale groups: statistic small
    cells_eq = []
    for g in range(4):
        vals = rng.randint(-50, 51, 300)
        med = int(np.median(vals))
        for dv in np.abs(vals - med):
            cells_eq.append((g, int(dv), 1))
    x2_eq, k, n = fligner_killeen(cells_eq)
    # one group 10x spread
    cells_ne = []
    for g in range(4):
        scale = 10 if g == 2 else 1
        vals = rng.randint(-50 * scale, 51 * scale, 300)
        med = int(np.median(vals))
        for dv in np.abs(vals - med):
            cells_ne.append((g, int(dv), 1))
    x2_ne, _, _ = fligner_killeen(cells_ne)
    assert x2_ne > 100 > x2_eq
    # df = 3 here; just sanity: equal-scale stat is modest
    assert x2_eq < 12


# ---------------------------------------------------------------------------
# 3-way information / fightin' words / rank turbulence
# ---------------------------------------------------------------------------

from log_analysis_ai_ray.pipelines.queries_ext5 import (  # noqa: E402
    entropies_3way, fightin_words_z, rtd_contribution)


def test_entropies_independent_variables():
    # fully independent uniform 2x2x2: H(xyz) = 3 ln 2, TC = 0, II = 0
    cells = {(x, y, z): 5 for x in range(2) for y in range(2)
             for z in range(2)}
    h = entropies_3way(cells)
    ln2 = np.log(2)
    assert abs(h["xyz"] - 3 * ln2) < 1e-12
    tc = h["x"] + h["y"] + h["z"] - h["xyz"]
    assert abs(tc) < 1e-12
    ii = (h["x"] + h["y"] + h["z"] - h["xy"] - h["xz"] - h["yz"]
          + h["xyz"])
    assert abs(ii) < 1e-12


def test_entropies_xor_interaction():
    # XOR: z = x^y with uniform x,y — pairwise independent but
    # jointly determined: II = -ln 2 (synergy is NEGATIVE in the
    # McGill sum convention used here)
    cells = {(x, y, x ^ y): 10 for x in range(2) for y in range(2)}
    h = entropies_3way(cells)
    ii = (h["x"] + h["y"] + h["z"] - h["xy"] - h["xz"] - h["yz"]
          + h["xyz"])
    assert abs(ii + np.log(2)) < 1e-12
    # copy chain: z = y = x -> redundancy, II = +ln 2
    cells2 = {(x, x, x): 10 for x in range(2)}
    h2 = entropies_3way(cells2)
    ii2 = (h2["x"] + h2["y"] + h2["z"] - h2["xy"] - h2["xz"]
           - h2["yz"] + h2["xyz"])
    assert abs(ii2 - np.log(2)) < 1e-12


def test_fightin_words_sign_and_symmetry():
    # word overused by corpus a -> positive z; swap -> negated
    z = fightin_words_z(50, 1000, 5, 1000, 0.01, 1.0, 1.0)
    zr = fightin_words_z(5, 1000, 50, 1000, 0.01, 1.0, 1.0)
    assert z > 3 and abs(z + zr) < 1e-12
    # equal rates -> z == 0
    assert fightin_words_z(7, 100, 7, 100, 0.01, 1.0, 1.0) == 0.0


def test_rtd_contribution_properties():
    assert rtd_contribution(5, 5) == 0.0
    # rank swaps near the head dominate equal-sized swaps in the tail
    assert rtd_contribution(1, 2) > rtd_contribution(100, 101)
    assert abs(rtd_contribution(1, 8)
               - abs(1 - 8 ** (-1 / 3))) < 1e-12


# ---------------------------------------------------------------------------
# QLR sup-F / ZIP fit / Mardia
# ---------------------------------------------------------------------------

from log_analysis_ai_ray.pipelines.queries_ext5 import (  # noqa: E402
    mardia_stats, qlr_supf, zip_mom)


def test_qlr_finds_planted_break():
    rng = np.random.RandomState(3)
    n = 120
    xs = list(range(n))
    # slope doubles at t=70
    ys = [int(1000 + 5 * t + rng.randint(-20, 21)) if t < 70
          else int(1000 + 5 * 70 + 15 * (t - 70)
                   + rng.randint(-20, 21)) for t in xs]
    supf, k = qlr_supf(xs, ys)
    assert supf > 50
    assert 60 <= k <= 80
    # no break: supF stays modest
    flat = [int(1000 + 5 * t + rng.randint(-20, 21)) for t in xs]
    supf2, _ = qlr_supf(xs, flat)
    assert supf2 < supf / 3


def test_zip_mom_recovers_parameters():
    rng = np.random.RandomState(7)
    pi_true, lam_true = 0.4, 3.0
    n = 200_000
    mask = rng.rand(n) < pi_true
    y = rng.poisson(lam_true, n)
    y[mask] = 0
    m, v, lam, pi, p0m, p0o = zip_mom(
        n, int(y.sum()), int((y.astype(np.int64) ** 2).sum()),
        int((y == 0).sum()))
    assert abs(lam - lam_true) < 0.1
    assert abs(pi - pi_true) < 0.02
    assert abs(p0m - p0o) < 0.01


def test_zip_pure_poisson_pi_near_zero():
    rng = np.random.RandomState(1)
    y = rng.poisson(2.0, 100_000).astype(np.int64)
    _, _, lam, pi, _, _ = zip_mom(len(y), int(y.sum()),
                                  int((y ** 2).sum()),
                                  int((y == 0).sum()))
    assert abs(pi) < 0.02 and abs(lam - 2.0) < 0.05


def test_mardia_normal_vs_skewed():
    rng = np.random.RandomState(5)
    n = 300
    pts = [(int(a), int(b)) for a, b in
           zip(rng.normal(1000, 100, n), rng.normal(500, 60, n))]
    b1, b2 = mardia_stats(pts)
    assert abs(b1) < 0.3            # near 0 for normal
    assert abs(b2 - 8.0) < 1.2      # k(k+2) = 8
    # heavily skewed: exponentiate one coordinate
    pts_s = [(int(np.exp(a / 300)), y) for (a, y) in
             [(rng.normal(1000, 300), int(v))
              for v in rng.normal(500, 60, n)]]
    b1s, _ = mardia_stats(pts_s)
    assert b1s > 1.0


# ---------------------------------------------------------------------------
# bitmap runs / Poisson rate / Skellam
# ---------------------------------------------------------------------------

from log_analysis_ai_ray.pipelines.queries_ext5 import (  # noqa: E402
    poisson_rate_z, skellam_mom)


def test_poisson_rate_z_equal_and_shifted():
    assert abs(poisson_rate_z(100, 1.0, 100, 1.0)) < 1e-12
    assert poisson_rate_z(200, 1.0, 100, 1.0) > 3
    assert poisson_rate_z(100, 1.0, 200, 1.0) < -3


def test_skellam_recovers_rates():
    rng = np.random.RandomState(9)
    mu1, mu2 = 40.0, 15.0
    n = 100_000
    d = rng.poisson(mu1, n).astype(np.int64) \
        - rng.poisson(mu2, n).astype(np.int64)
    m, v, h1, h2 = skellam_mom(n, int(d.sum()),
                               int((d * d).sum()))
    assert abs(h1 - mu1) < 0.5
    assert abs(h2 - mu2) < 0.5
    assert abs(m - (mu1 - mu2)) < 0.2


def test_skellam_exact_identities():
    # constant difference c: var 0 -> mu1 = mu2 = ... m/2, v=0
    d = [5] * 10
    m, v, h1, h2 = skellam_mom(10, sum(d), sum(x * x for x in d))
    assert m == 5.0 and abs(v) < 1e-12
    assert abs(h1 - 2.5) < 1e-12 and abs(h2 + 2.5) < 1e-12


# ---------------------------------------------------------------------------
# CMH test / codec selector / partition planner
# ---------------------------------------------------------------------------

from log_analysis_ai_ray.pipelines.queries_ext5 import (  # noqa: E402
    cmh_chi2, codec_bits_milli, codec_choice, plan_partitions)


def test_cmh_null_vs_consistent_association():
    # independent strata: chi2 small
    null_cells = [(25, 25, 25, 25)] * 10
    chi2_null, sa, se = cmh_chi2(null_cells)
    assert abs(sa - se) < 1e-9 and chi2_null < 0.1
    # consistent positive association in every stratum
    assoc = [(40, 10, 10, 40)] * 10
    chi2_assoc, _, _ = cmh_chi2(assoc)
    assert chi2_assoc > 50


def test_cmh_matches_single_stratum_formula():
    a, b, c, d = 30, 20, 15, 35
    chi2, sa, se = cmh_chi2([(a, b, c, d)])
    n = a + b + c + d
    e = (a + b) * (a + c) / n
    v = (a + b) * (c + d) * (a + c) * (b + d) / (n * n * (n - 1))
    assert abs(chi2 - (abs(a - e) - 0.5) ** 2 / v) < 1e-12


def test_codec_choice_matrix():
    assert codec_choice(2, 100) == "RLE_DICT"
    assert codec_choice(2, 900) == "DICT"
    assert codec_choice(20, 100) == "RLE"
    assert codec_choice(20, 900) == "PLAIN"


def test_codec_bits_estimates():
    assert codec_bits_milli("DICT", 3, 0, 100) == 3000
    # 10 runs of (3+20) bits over 1000 values = 0.23 bits/value
    assert codec_bits_milli("RLE_DICT", 3, 10, 1000) == 230
    assert codec_bits_milli("PLAIN", 0, 0, 1) == 32000
    assert codec_bits_milli("RLE", 0, 10, 1000) == 520


def test_plan_partitions():
    t = 128 * 1024 * 1024
    assert plan_partitions(1) == (1, 1)
    assert plan_partitions(t) == (1, 1)
    assert plan_partitions(t + 1) == (2, 2)
    assert plan_partitions(5 * t) == (5, 8)
    assert plan_partitions(1000 * t)[1] == 1024


# ---------------------------------------------------------------------------
# A/A calibration / Yuen trimmed t
# ---------------------------------------------------------------------------

from log_analysis_ai_ray.pipelines.queries_ext5 import (  # noqa: E402
    aa_calibration, trimmed_winsor_sums, welch_z, yuen_t)


def test_welch_z_zero_and_signed():
    # identical arms -> z = 0
    assert abs(welch_z(10, 50, 300, 10, 50, 300)) < 1e-12
    # arm1 mean higher -> positive; swap -> symmetric negative
    z = welch_z(10, 80, 700, 10, 50, 300)
    assert z > 0
    assert abs(welch_z(10, 50, 300, 10, 80, 700) + z) < 1e-12


def test_aa_calibration_uniform_and_extreme():
    # perfectly calibrated: z's whose p-values tile (0,1) evenly-ish
    from log_analysis_ai_ray.pipelines.queries_ext5 import phi_as
    # invert: pick z so that 2*(1-Phi(z)) = (i+0.5)/n via bisection
    def z_for_p(p):
        lo, hi = 0.0, 10.0
        for _ in range(80):
            mid = (lo + hi) / 2
            if 2.0 * (1.0 - phi_as(mid)) > p:
                lo = mid
            else:
                hi = mid
        return lo
    n = 20
    zs = [z_for_p((i + 0.5) / n) for i in range(n)]
    ns, rej, ks = aa_calibration(zs)
    # midpoint grid: only p=0.025 < 0.05 rejects -> exactly 1/20 = 5%
    assert ns == n and rej == 1
    assert ks <= 0.5 / n + 1e-6  # midpoint grid -> KS = 1/(2n)
    # all huge z's: everything rejects, p's pile at 0 -> KS ~ 1
    ns2, rej2, ks2 = aa_calibration([5.0] * n)
    assert rej2 == n and ks2 > 0.99


def test_trimmed_winsor_sums_textbook():
    # values 1..10, one each, 20% trim -> g=2, keep 3..8
    vals = list(range(1, 11))
    cnts = [1] * 10
    h, ts, ws, wss, v_lo, v_hi = trimmed_winsor_sums(vals, cnts, 2)
    assert h == 6 and ts == sum(range(3, 9))
    assert (v_lo, v_hi) == (3, 8)
    assert ws == ts + 2 * 3 + 2 * 8
    assert wss == sum(v * v for v in range(3, 9)) + 2 * 9 + 2 * 64


def test_trimmed_winsor_sums_multiplicity_boundary():
    # histogram with runs straddling the trim boundary
    vals = [1, 2, 3]
    cnts = [4, 4, 4]  # n=12, g=2 -> ranks 3..10
    h, ts, ws, wss, v_lo, v_hi = trimmed_winsor_sums(vals, cnts, 2)
    assert h == 8
    # ranks 3,4 -> value1 x2; 5..8 -> value2 x4; 9,10 -> value3 x2
    assert ts == 2 * 1 + 4 * 2 + 2 * 3
    assert (v_lo, v_hi) == (1, 3)


def test_yuen_t_identical_samples_zero():
    vals = list(range(1, 11))
    cnts = [3] * 10
    n = 30
    g = int(0.2 * n)
    h, ts, ws, wss, _, _ = trimmed_winsor_sums(vals, cnts, g)
    t, df = yuen_t(h, ts, ws, wss, n, g, h, ts, ws, wss, n, g)
    assert abs(t) < 1e-12 and df > 1


def test_yuen_t_matches_naive_float_reference():
    rng = np.random.RandomState(4)
    a = rng.randint(0, 50, 200)
    b = rng.randint(10, 60, 150)

    def naive(x):
        x = np.sort(x)
        n = len(x)
        g = int(np.floor(0.2 * n))
        tr = x[g:n - g]
        w = x.copy()
        w[:g] = x[g]
        w[n - g:] = x[n - g - 1]
        return len(tr), tr.sum(), w.sum(), (w * w).sum(), n, g

    def hist(x):
        v, c = np.unique(x, return_counts=True)
        return v.tolist(), c.tolist()

    ha, tsa, wsa, wssa, na, ga = naive(a)
    hb, tsb, wsb, wssb, nb, gb = naive(b)
    t_ref, df_ref = yuen_t(ha, tsa, wsa, wssa, na, ga,
                           hb, tsb, wsb, wssb, nb, gb)
    va, ca = hist(a)
    vb, cb = hist(b)
    h1, ts1, ws1, wss1, _, _ = trimmed_winsor_sums(va, ca, ga)
    h2, ts2, ws2, wss2, _, _ = trimmed_winsor_sums(vb, cb, gb)
    assert (h1, ts1, ws1, wss1) == (ha, tsa, wsa, wssa)
    assert (h2, ts2, ws2, wss2) == (hb, tsb, wsb, wssb)
    t_h, df_h = yuen_t(h1, ts1, ws1, wss1, na, ga,
                       h2, ts2, ws2, wss2, nb, gb)
    assert abs(t_h - t_ref) < 1e-12 and abs(df_h - df_ref) < 1e-12


# ---------------------------------------------------------------------------
# Newey-West / consistent-hash ring / Passing-Bablok
# ---------------------------------------------------------------------------

from log_analysis_ai_ray.pipelines.queries_ext5 import (  # noqa: E402
    build_ring, newey_west_se, nw_scores, pb_estimate, ring_arcs,
    ring_owner_nodes)


def test_nw_matches_naive_float_reference():
    rng = np.random.RandomState(7)
    xs = list(range(60))
    ys = (100 + 3 * np.arange(60) + rng.randint(-20, 21, 60)).tolist()
    n, sxx1, slope, vf, ssr = nw_scores(xs, ys)
    # naive float reference
    x = np.asarray(xs, float)
    y = np.asarray(ys, float)
    b, a = np.polyfit(x, y, 1)
    e = y - a - b * x
    u = x - x.mean()
    assert abs(slope - b) < 1e-9
    assert np.allclose(vf, u * e, atol=1e-6)
    assert abs(ssr - (e * e).sum()) < 1e-4
    suu = float(sxx1) / n
    L = 5
    s = (u * e @ (u * e))
    for lag in range(1, L + 1):
        w = 1.0 - lag / (L + 1.0)
        s += 2.0 * w * float((u * e)[lag:] @ (u * e)[:-lag])
    assert abs(newey_west_se(vf, suu, L)
               - math.sqrt(s / suu ** 2)) < 1e-9


def test_nw_white_noise_ratio_near_one_ar1_inflates():
    rng = np.random.RandomState(11)
    n = 400
    xs = list(range(n))
    # white noise around a trend
    ys = (1000 + 2 * np.arange(n) + rng.randint(-50, 51, n)).tolist()
    nn, sxx1, _, vf, ssr = nw_scores(xs, ys)
    suu = float(sxx1) / nn
    se_h = newey_west_se(vf, suu, 5)
    se_o = math.sqrt((ssr / (nn - 2)) / suu)
    assert 0.7 < se_h / se_o < 1.3
    # strongly AR(1) residuals -> HAC must inflate
    eps = np.zeros(n)
    shocks = rng.randint(-50, 51, n)
    for i in range(1, n):
        eps[i] = 0.9 * eps[i - 1] + shocks[i]
    ys2 = (1000 + 2 * np.arange(n) + eps.round().astype(int)).tolist()
    nn, sxx1, _, vf, ssr = nw_scores(xs, ys2)
    suu = float(sxx1) / nn
    assert (newey_west_se(vf, suu, 5)
            > 1.5 * math.sqrt((ssr / (nn - 2)) / suu))


def test_ring_positions_distinct_and_arcs_close():
    ring = build_ring()
    assert len(ring) == 256
    assert len({p for p, _ in ring}) == 256
    arcs = ring_arcs(ring)
    assert sum(arcs.values()) == 1 << 32
    # 32 vnodes/node -> every node within ~3x of the fair share
    fair = (1 << 32) / 8
    for node, arc in arcs.items():
        assert 0.3 * fair < arc < 3.0 * fair, (node, arc / fair)


def test_ring_owner_wraps_and_succeeds():
    ring = build_ring()
    pos = [p for p, _ in ring]
    nodes = [n for _, n in ring]
    # a key above the max position wraps to the first entry
    import numpy as _np
    owner = ring_owner_nodes(ring, _np.array([pos[-1] + 1], dtype=_np.int64))
    assert owner[0] == nodes[0]
    # a key exactly on a position is owned by it (side='left')
    owner = ring_owner_nodes(ring, _np.array([pos[3]], dtype=_np.int64))
    assert owner[0] == nodes[3]
    # between entries i and i+1 -> owned by i+1
    mid = (pos[3] + pos[4]) // 2
    if mid > pos[3]:
        owner = ring_owner_nodes(ring, _np.array([mid], dtype=_np.int64))
        assert owner[0] == nodes[4]


def test_pb_recovers_line_and_is_outlier_robust():
    xs = list(range(1, 21))
    ys = [2 * x + 1 for x in xs]
    n, k, b, a = pb_estimate(xs, ys)
    assert abs(b - 2.0) < 1e-12 and abs(a - 1.0) < 1e-12
    assert k == 0
    # one wild outlier day barely moves the median slope
    ys2 = list(ys)
    ys2[10] = 10_000
    _, _, b2, _ = pb_estimate(xs, ys2)
    assert abs(b2 - 2.0) < 0.2


def test_pb_k_offset_negative_relation():
    # y = -2x + 50: every slope is -2 < -1 -> K = N, median shifted
    # fully right but clamped into range; slope still -2
    xs = list(range(1, 11))
    ys = [-2 * x + 50 for x in xs]
    n, k, b, _ = pb_estimate(xs, ys)
    assert k == n and abs(b + 2.0) < 1e-12
    # x-ties and S == -1 slopes are excluded
    n2, _, _, _ = pb_estimate([1, 1, 2], [5, 7, 9])
    # pairs: (1,1) x-tie skipped; (1,2)->4; (1,2)->2
    assert n2 == 2

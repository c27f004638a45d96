"""Kernel semantics for the round-3m batch: Kruskal–Wallis midrank
identities and isotonic-regression PAVA vs its minimax
characterization (the oracle's form)."""

from fractions import Fraction

import numpy as np

from log_analysis_ai_ray.pipelines.queries_ext import _pava_fractions


def _minimax_iso(y):
    """fit_i = max_{j<=i} min_{k>=i} avg(y[j..k]) — exact rationals."""
    n = len(y)
    out = []
    for i in range(n):
        best = None
        for j in range(i + 1):
            mn = None
            for k in range(i, n):
                a = Fraction(sum(y[j:k + 1]), k - j + 1)
                mn = a if mn is None or a < mn else mn
            best = mn if best is None or mn > best else best
        out.append(best)
    return out


def test_pava_equals_minimax_random():
    rng = np.random.default_rng(11)
    for _ in range(5):
        y = [int(v) for v in rng.integers(-50, 50, 12)]
        assert _pava_fractions(y) == _minimax_iso(y)


def test_pava_monotone_and_mean_preserving():
    rng = np.random.default_rng(4)
    y = [int(v) for v in rng.integers(0, 1000, 30)]
    fit = _pava_fractions(y)
    assert all(a <= b for a, b in zip(fit, fit[1:]))
    assert sum(fit) == sum(Fraction(v) for v in y)  # projection keeps mass


def test_pava_already_monotone_is_identity():
    y = [1, 2, 2, 5, 9]
    assert _pava_fractions(y) == [Fraction(v) for v in y]


def test_midrank_doubled_ranks_match_scipy_style():
    # doubled average midranks from a histogram == 2x rankdata('average')
    vals = np.array([5, 3, 5, 1, 3, 3], dtype=np.int64)
    vu, vi = np.unique(vals, return_inverse=True)
    cv = np.bincount(vi).astype(np.int64)
    cumb = np.concatenate(([0], np.cumsum(cv)[:-1]))
    r2 = 2 * cumb + cv + 1
    # manual average ranks: 1 ->1; 3 -> (2+3+4)/3=3; 5 -> (5+6)/2=5.5
    got = r2[vi] / 2.0
    assert np.allclose(got, [5.5, 3.0, 5.5, 1.0, 3.0, 3.0])


def test_kruskal_identical_groups_h_zero():
    # two groups with identical value multisets -> rank sums equal
    # expectation -> H == 0 exactly (before tie correction division)
    a = np.array([1, 2, 3], dtype=np.int64)
    groups = {"x": a, "y": a.copy()}
    allv = np.concatenate(list(groups.values()))
    vu, vi = np.unique(allv, return_inverse=True)
    cv = np.bincount(vi).astype(np.int64)
    cumb = np.concatenate(([0], np.cumsum(cv)[:-1]))
    r2 = 2 * cumb + cv + 1
    n = len(allv)
    sumterm = 0.0
    pos = 0
    for g in groups.values():
        idx = vi[pos:pos + len(g)]
        r2sum = int(r2[idx].sum())
        sumterm += float(r2sum) * r2sum / (4.0 * len(g))
        pos += len(g)
    h = 12.0 * sumterm / (float(n) * (n + 1)) - 3.0 * (n + 1)
    assert abs(h) < 1e-9


def _qn_from_hist(vals, counts):
    lut = dict(zip([int(v) for v in vals], [int(c) for c in counts]))
    n = sum(lut.values())
    h = n // 2 + 1
    k = h * (h - 1) // 2
    cum = 0
    for e in range(0, max(lut) - min(lut) + 1):
        if e == 0:
            cum += sum(c * (c - 1) // 2 for c in lut.values())
        else:
            cum += sum(c * lut.get(v + e, 0) for v, c in lut.items())
        if cum >= k:
            return n, k, e
    return n, k, None


def test_qn_matches_bruteforce_pairs():
    rng = np.random.default_rng(6)
    xs = rng.integers(1, 51, 301)
    vu, cc = np.unique(xs, return_counts=True)
    n, k, qn = _qn_from_hist(vu, cc)
    diffs = np.abs(xs[:, None] - xs[None, :])[np.triu_indices(len(xs), 1)]
    assert n == len(xs)
    assert qn == int(np.sort(diffs)[k - 1])


def test_qn_constant_data_zero_scale():
    n, k, qn = _qn_from_hist([7], [100])
    assert qn == 0


def test_zipf_slope_exact_powerlaw_recovered():
    # counts = round(C * r^-1) gives slope ~ -1 on the log-log fit
    r = np.arange(1, 201, dtype=np.float64)
    c = 1e6 / r
    x, y = np.log(r), np.log(c)
    n = float(len(r))
    slope = (n * (x * y).sum() - x.sum() * y.sum()) \
        / (n * (x * x).sum() - x.sum() ** 2)
    assert abs(slope + 1.0) < 1e-9


def test_shapley_axioms_on_toy_histogram():
    # 4-channel coalition game v(S) = count of purchases with T ⊆ S
    W24 = {0: 6, 1: 2, 2: 2, 3: 6}
    hist = np.zeros(16, dtype=np.int64)
    hist[0b0001] = 10   # click-only journeys
    hist[0b0011] = 6    # click+error
    hist[0b0000] = 3    # organic (no touch)

    def v(s):
        return int(sum(hist[t] for t in range(16) if (t & ~s) == 0))

    phis = []
    for i in range(4):
        bit = 1 << i
        phi = 0
        for s in range(16):
            if s & bit:
                continue
            phi += W24[bin(s).count("1")] * (v(s | bit) - v(s))
        phis.append(phi)
    # efficiency: Σφ·24⁻¹ == v(full) − v(∅)
    assert sum(phis) == 24 * (v(15) - v(0))
    # dummy channels (never in any journey) get exactly zero
    assert phis[2] == 0 and phis[3] == 0
    # click dominates error: click appears in all journeys, error in 6
    assert phis[0] > phis[1] > 0
    # symmetric game check: two interchangeable channels tie exactly
    hist2 = np.zeros(16, dtype=np.int64)
    hist2[0b0011] = 7

    def v2(s):
        return int(sum(hist2[t] for t in range(16) if (t & ~s) == 0))

    p0 = sum(W24[bin(s).count('1')] * (v2(s | 1) - v2(s))
             for s in range(16) if not s & 1)
    p1 = sum(W24[bin(s).count('1')] * (v2(s | 2) - v2(s))
             for s in range(16) if not s & 2)
    assert p0 == p1 == 24 * 7 // 2


def test_croston_recursion_manual():
    # demands (day, size): init z=y1; at demand 2: p = gap
    days = [3, 5, 10, 11]
    ys = [100, 40, 60, 200]
    z, p = ys[0], None
    for i in range(1, len(days)):
        q = days[i] - days[i - 1]
        z = (ys[i] + z) // 2
        p = q if p is None else (q + p) // 2
    # step-by-step: z=70 p=2; z=65 p=3 ((5+2)//2); z=132 p=2 ((1+3)//2)
    assert (z, p) == (132, 2)


def _lpa_rounds(n, pairs, rounds=3):
    a = np.concatenate([pairs[:, 0], pairs[:, 1]])
    b = np.concatenate([pairs[:, 1], pairs[:, 0]])
    labels = np.arange(n, dtype=np.int64)
    for _ in range(rounds):
        nl = labels[b]
        key = a * np.int64(n) + nl
        ku, kc = np.unique(key, return_counts=True)
        kn, kl = ku // n, ku % n
        order = np.lexsort((kl, -kc, kn))
        kn_o = kn[order]
        first = np.ones(len(kn_o), dtype=bool)
        first[1:] = kn_o[1:] != kn_o[:-1]
        new = labels.copy()
        new[kn_o[first]] = kl[order][first]
        labels = new
    return labels


def test_lpa_two_cliques_separate_communities():
    # two 4-cliques joined by one bridge edge: LPA keeps them apart
    import itertools
    c1 = list(itertools.combinations(range(4), 2))
    c2 = list(itertools.combinations(range(4, 8), 2))
    pairs = np.array(c1 + c2 + [(3, 4)], dtype=np.int64)
    labels = _lpa_rounds(8, pairs)
    left = set(labels[:4].tolist())
    right = set(labels[4:].tolist())
    assert len(left) == 1 and len(right) == 1
    assert left != right


def test_lpa_min_label_tie_break():
    # triangle: after round 1 every node takes the min other label
    pairs = np.array([(0, 1), (1, 2), (0, 2)], dtype=np.int64)
    labels = _lpa_rounds(3, pairs, rounds=1)
    # node0's neighbors have labels {1,2} -> tie -> min = 1
    assert labels.tolist() == [1, 0, 0]


def _haar_energies(x, levels=(1, 2, 3)):
    out = []
    p = 1
    while p * 2 <= len(x):
        p *= 2
    x = [int(v) for v in x[:p]]
    for lvl in levels:
        blk = 1 << lvl
        half = blk >> 1
        e = 0
        for j in range(p // blk):
            d = sum(x[j * blk:j * blk + half]) \
                - sum(x[j * blk + half:(j + 1) * blk])
            e += d * d
        out.append(e)
    return out


def test_haar_constant_series_zero_energy():
    assert _haar_energies([7] * 16) == [0, 0, 0]


def test_haar_alternating_all_energy_at_level1():
    e1, e2, e3 = _haar_energies([1, -1] * 8)
    assert e1 > 0 and e2 == 0 and e3 == 0


def test_haar_block_trend_concentrates_at_coarse_level():
    # step function flipping every 4 samples: detail only at level 3
    x = [1] * 4 + [-1] * 4 + [1] * 4 + [-1] * 4
    e1, e2, e3 = _haar_energies(x)
    assert e1 == 0 and e2 == 0 and e3 > 0


def test_mh_or_confounded_strata():
    # two strata, within-stratum OR == 1, but exposure and outcome
    # both concentrate in stratum 1 -> crude OR > 1 (confounding)
    strata = [
        # (a, b, c, d): exposed-high, exposed-low, ctl-high, ctl-low
        (80, 20, 8, 2),    # stratum 1: P(high)=0.8 both arms
        (2, 8, 20, 80),    # stratum 2: P(high)=0.2 both arms
    ]
    num = den = 0.0
    a_t = b_t = c_t = d_t = 0
    for a, b, c, d in strata:
        nt = a + b + c + d
        num += a * d / nt
        den += b * c / nt
        a_t += a
        b_t += b
        c_t += c
        d_t += d
    mh = num / den
    crude = (a_t * d_t) / (b_t * c_t)
    assert abs(mh - 1.0) < 1e-9
    assert crude > 3.0


def _seg_sse_scaled(y, i, j, L=5354228880):
    s = sum(y[i:j])
    q = sum(v * v for v in y[i:j])
    return q * L - s * s * (L // (j - i))


def test_optimal_segmentation_finds_true_breaks():
    # three flat levels with noiseless data -> SSE 0 at true breaks
    y = [10] * 8 + [50] * 8 + [20] * 8
    best = None
    n = len(y)
    for b1 in range(1, n - 1):
        for b2 in range(b1 + 1, n):
            c = (_seg_sse_scaled(y, 0, b1) + _seg_sse_scaled(y, b1, b2)
                 + _seg_sse_scaled(y, b2, n))
            if best is None or (c, b1, b2) < best:
                best = (c, b1, b2)
    assert best == (0, 8, 16)


def test_seg_sse_scaled_matches_float_sse():
    rng = np.random.default_rng(8)
    y = [int(v) for v in rng.integers(0, 100, 10)]
    L = 5354228880
    got = _seg_sse_scaled(y, 2, 9, L) / L
    arr = np.array(y[2:9], dtype=float)
    assert abs(got - ((arr - arr.mean()) ** 2).sum()) < 1e-6


def test_greedy_cover_prefers_disjoint_docs():
    # doc A covers {1..5}, doc B {1..4}, doc C {6,7}: greedy picks A
    # then C (2 new) over B (0 new)
    docs = {1: set("abcde"), 2: set("abcd"), 3: set("fg")}
    covered = set()
    picks = []
    for _ in range(2):
        best = None
        for d, tk in sorted(docs.items()):
            if d in picks:
                continue
            nt = len(tk - covered)
            key = (-nt, d)
            if best is None or key < best[0]:
                best = (key, d, tk)
        picks.append(best[1])
        covered |= best[2]
    assert picks == [1, 3]


def test_energy_distance_identical_distributions_zero():
    hx = [(1, 5), (3, 2), (9, 4)]
    hy = list(hx)

    def pair_sum(ha, hb):
        return sum(ca * cb * abs(va - vb)
                   for va, ca in ha for vb, cb in hb)

    nx = sum(c for _, c in hx)
    ny = sum(c for _, c in hy)
    num = (2 * pair_sum(hx, hy) * nx * ny
           - pair_sum(hx, hx) * ny * ny - pair_sum(hy, hy) * nx * nx)
    assert num == 0


def test_energy_distance_shift_positive_and_matches_flat():
    rng = np.random.default_rng(5)
    xs = rng.integers(0, 20, 200)
    ys = rng.integers(5, 25, 150)

    def flat_e(a, b):
        return np.abs(a[:, None] - b[None, :]).sum() / (len(a) * len(b))

    d2_flat = 2 * flat_e(xs, ys) - flat_e(xs, xs) - flat_e(ys, ys)
    vu, cu = np.unique(xs, return_counts=True)
    wu, du = np.unique(ys, return_counts=True)
    hx = list(zip(vu.tolist(), cu.tolist()))
    hy = list(zip(wu.tolist(), du.tolist()))

    def pair_sum(ha, hb):
        return sum(ca * cb * abs(va - vb)
                   for va, ca in ha for vb, cb in hb)

    nx, ny = len(xs), len(ys)
    num = (2 * pair_sum(hx, hy) * nx * ny
           - pair_sum(hx, hx) * ny * ny - pair_sum(hy, hy) * nx * nx)
    d2_hist = num / (nx * nx * ny * ny)
    assert d2_hist > 0
    assert abs(d2_hist - d2_flat) < 1e-9


def test_ransac_rejects_outliers_ols_cannot():
    # 20 collinear points + 4 gross outliers: RANSAC consensus line
    # recovers the true slope exactly
    xs = list(range(24))
    ys = [100 * x + 7 for x in xs]
    for k in (3, 9, 15, 21):
        ys[k] += 10_000_000
    tol = 50
    best = None
    for i in range(24):
        for j in range(i + 1, 24):
            dx, dy = xs[j] - xs[i], ys[j] - ys[i]
            inl = sum(
                1 for k in range(24)
                if abs((ys[k] - ys[i]) * dx - dy * (xs[k] - xs[i]))
                <= tol * abs(dx))
            key = (-inl, xs[i], xs[j])
            if best is None or key < best[0]:
                best = (key, dx, dy, inl)
    _, dx, dy, inl = best
    assert inl == 20
    assert dy // dx == 100


def _weiszfeld(x, iters=20):
    m = x.mean(axis=0)
    for _ in range(iters):
        d = np.sqrt(((x - m) ** 2).sum(axis=1))
        keep = d > 0
        w = 1.0 / d[keep]
        m = (x[keep] * w[:, None]).sum(axis=0) / w.sum()
    return m


def test_geomedian_resists_outlier():
    rng = np.random.default_rng(12)
    x = rng.normal(0, 1, (200, 8))
    x_out = np.vstack([x, np.full((1, 8), 1e6)])
    mean_shift = np.linalg.norm(x_out.mean(axis=0) - x.mean(axis=0))
    gm_shift = np.linalg.norm(_weiszfeld(x_out) - _weiszfeld(x))
    assert mean_shift > 1000       # the mean is dragged away
    assert gm_shift < 1.0          # the geometric median barely moves


def test_geomedian_1d_is_median():
    x = np.array([[1.0], [2.0], [3.0], [4.0], [100.0]])
    gm = _weiszfeld(x, iters=200)
    assert abs(gm[0] - 3.0) < 1e-3


def _cms_insert(tokens_u64, d=4, w=4096,
                ks=(0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                    0x165667B19E3779F9, 0xD6E8FEB86659FD93)):
    mat = np.zeros((d, w), dtype=np.int64)
    for j, a in enumerate(ks):
        idx = ((tokens_u64 * np.uint64(a)) >> np.uint64(52)) \
            % np.uint64(w)
        np.add.at(mat[j], idx.astype(np.int64), 1)
    return mat


def _cms_query(mat, x_u64,
               ks=(0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                   0x165667B19E3779F9, 0xD6E8FEB86659FD93)):
    w = mat.shape[1]
    est = np.iinfo(np.int64).max
    for j, a in enumerate(ks):
        idx = int(((np.uint64(x_u64) * np.uint64(a)) >> np.uint64(52))
                  % np.uint64(w))
        est = min(est, int(mat[j, idx]))
    return est


def test_cms_linear_merge_and_overcount():
    rng = np.random.default_rng(13)
    a = rng.integers(0, 2**63, 5000).astype(np.uint64)
    b = rng.integers(0, 2**63, 5000).astype(np.uint64)
    merged = _cms_insert(np.concatenate([a, b]))
    summed = _cms_insert(a) + _cms_insert(b)
    assert (merged == summed).all()     # linear sketch: merge == sum
    # overcount property: estimate never below the exact count
    probe = a[0]
    exact = int((np.concatenate([a, b]) == probe).sum())
    assert _cms_query(merged, probe) >= exact


def test_wasserstein_hist_matches_flat_scipy_free():
    rng = np.random.default_rng(14)
    xs = np.sort(rng.integers(0, 30, 120))
    ys = np.sort(rng.integers(3, 40, 80))
    # flat reference: W1 = ∫|Fx - Fy| via merged support sweep
    support = np.unique(np.concatenate([xs, ys]))
    fx = np.searchsorted(xs, support, side="right") / len(xs)
    fy = np.searchsorted(ys, support, side="right") / len(ys)
    w1_ref = float(np.sum(np.abs(fx[:-1] - fy[:-1])
                          * np.diff(support)))
    # histogram-integer form
    vux, cux = np.unique(xs, return_counts=True)
    vuy, cuy = np.unique(ys, return_counts=True)
    cx = np.zeros(len(support), dtype=np.int64)
    cy = np.zeros(len(support), dtype=np.int64)
    cx[np.searchsorted(support, vux)] = cux
    cy[np.searchsorted(support, vuy)] = cuy
    nx, ny = len(xs), len(ys)
    cumx, cumy = np.cumsum(cx), np.cumsum(cy)
    num = sum(abs(int(cumx[i]) * ny - int(cumy[i]) * nx)
              * int(support[i + 1] - support[i])
              for i in range(len(support) - 1))
    assert abs(num / (nx * ny) - w1_ref) < 1e-9


def test_wasserstein_point_masses_is_distance():
    # all mass at 2 vs all mass at 7 -> W1 == 5 exactly
    support = np.array([2, 7])
    cumx, cumy = np.array([10, 10]), np.array([0, 10])
    num = abs(int(cumx[0]) * 10 - int(cumy[0]) * 10) * 5
    assert num // (10 * 10) == 5


def test_harmonic_centrality_star_graph():
    # star: hub reaches all at d=1; leaves reach hub at 1, others at 2
    n = 5
    adj = np.zeros((n, n), dtype=bool)
    for i in range(1, n):
        adj[0, i] = adj[i, 0] = True
    dist = np.zeros((n, n), dtype=np.int64)
    reach = np.eye(n, dtype=bool)
    frontier = np.eye(n, dtype=bool)
    for hop in range(1, 7):
        nxt = (frontier @ adj) & ~reach
        dist[nxt] = hop
        reach |= nxt
        frontier = nxt
    hub = sum(1_000_000 // d for d in dist[0] if d > 0)
    leaf = sum(1_000_000 // d for d in dist[1] if d > 0)
    assert hub == 4 * 1_000_000
    assert leaf == 1_000_000 + 3 * 500_000


def test_bucketed_store_alignment():
    # same key -> same bucket in both tables, by construction of the
    # shared knuth hash: joining bucket i of A with bucket i of B
    # loses no pairs
    from log_analysis_ai_ray.pipelines.queries import _knuth_bucket
    keys = np.arange(10_000, dtype=np.int64)
    ba = _knuth_bucket(keys, 16)
    bb = _knuth_bucket(keys.copy(), 16)
    assert (ba == bb).all()
    # every bucket non-trivially populated (hash spreads)
    assert len(np.unique(ba)) == 16


def test_flesch_simple_vs_complex_text():
    import re

    def flesch(text):
        w = len(re.findall(r"\S+", text.strip()))
        s = max(len(re.findall(r"[.!?]+", text)), 1)
        y = len(re.findall(r"[aeiouyAEIOUY]+", text))
        return 206.835 - 1.015 * w / s - 84.6 * y / w

    simple = "The cat sat. The dog ran. We go now."
    complex_ = ("Notwithstanding administrative considerations, "
                "organizational accountability necessitates "
                "comprehensive documentation.")
    assert flesch(simple) > flesch(complex_) + 30

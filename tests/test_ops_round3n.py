"""Kernel semantics for the round-3n batch: ZCR stage exactness on
constructed WAV clips and the SPRT integer walk."""

import math

import numpy as np
import pyarrow as pa


def _wav_bytes(samples, rate=8000):
    """Minimal PCM16 mono WAV writer (mirrors the synth corpus)."""
    import struct
    data = np.asarray(samples, dtype=np.int16).tobytes()
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate,
                                   rate * 2, 2, 16)
           + b"data" + struct.pack("<I", len(data)))
    return hdr + data


def _zcr_table(clips):
    from log_analysis_ai_ray.stages.multimodal import ZcrStage
    batch = pa.table({
        "media_id": pa.array(list(range(len(clips))), pa.int64()),
        "kind": pa.array(["audio"] * len(clips)),
        "payload": pa.array([_wav_bytes(c) for c in clips],
                            pa.binary()),
    })
    return ZcrStage()(batch)


def test_zcr_alternating_signs_max_rate():
    # +1,-1,+1,... : a flip at every consecutive pair -> 159 per frame
    clip = np.tile([1000, -1000], 160)  # 320 samples = 2 frames
    t = _zcr_table([clip])
    assert t.column("n_frames")[0].as_py() == 2
    assert t.column("zcr_total")[0].as_py() == 2 * 159
    assert t.column("high_zcr_frames")[0].as_py() == 2


def test_zcr_constant_sign_zero():
    clip = np.full(320, 500)
    t = _zcr_table([clip])
    assert t.column("zcr_total")[0].as_py() == 0
    assert t.column("high_zcr_frames")[0].as_py() == 0


def test_zcr_zero_samples_carry_sign():
    # +,0,0,- is ONE crossing (zeros carry the previous sign)
    frame = np.zeros(160, dtype=np.int64)
    frame[0] = 100
    frame[80] = -100
    t = _zcr_table([frame])
    assert t.column("zcr_total")[0].as_py() == 1


def test_zcr_low_freq_sine_one_inframe_crossing_per_period():
    # 50 Hz at 8 kHz -> one full period per 160-sample frame; the
    # pos->neg flip lands mid-frame, the neg->pos flip falls on the
    # frame BOUNDARY (not counted - frames are independent)
    n = 1600
    x = (1000 * np.sin(2 * np.pi * 50 * np.arange(n) / 8000))
    t = _zcr_table([x.astype(np.int64)])
    assert t.column("n_frames")[0].as_py() == 10
    assert t.column("zcr_total")[0].as_py() == 10


def test_sprt_integer_walk_stops_at_first_crossing():
    inc_s = round(1_000_000 * math.log(0.55 / 0.5))
    inc_f = round(1_000_000 * math.log(0.45 / 0.5))
    upper = round(1_000_000 * math.log(19.0))
    # 40 successes in a row crosses upward (40*95310 > 2944439)
    cum, cross = 0, None
    for d in range(100):
        cum += inc_s
        if cum >= upper:
            cross = d
            break
    assert cross == 30  # ceil(2944439 / 95310) - 1 (0-indexed)
    # balanced stream drifts DOWN to H0: per pair the LLR adds
    # ln(1.1)+ln(0.9) = ln(0.99) < 0 - a 50/50 truth accepts H0
    assert inc_s + inc_f < 0
    cum, dec = 0, None
    for d in range(1000):
        cum += inc_s + inc_f  # one success + one failure per step
        if cum <= -upper:
            dec = ("h0", d)
            break
    assert dec == ("h0", 292)


def test_linear_threshold_monotone_and_converges():
    # path graph 0-1-2-3 seeded at 0: deg(1)=2, one active neighbor
    # -> 2*1 >= 2 activates; spreads one hop per round
    n = 4
    adj = np.zeros((n, n), dtype=bool)
    for i in range(n - 1):
        adj[i, i + 1] = adj[i + 1, i] = True
    deg = adj.sum(axis=1).astype(np.int64)
    active = np.zeros(n, dtype=bool)
    active[0] = True
    sizes = []
    for _ in range(3):
        hits = (adj & active[None, :]).sum(axis=1).astype(np.int64)
        new = active | ((deg > 0) & (2 * hits >= deg))
        assert (new | active == new).all()  # monotone
        active = new
        sizes.append(int(active.sum()))
    assert sizes == [2, 3, 4]


def test_linear_threshold_majority_blocks():
    # star with 4 leaves, seed = one leaf: hub needs 2*1 >= 4 -> no
    n = 5
    adj = np.zeros((n, n), dtype=bool)
    for i in range(1, n):
        adj[0, i] = adj[i, 0] = True
    deg = adj.sum(axis=1).astype(np.int64)
    active = np.zeros(n, dtype=bool)
    active[1] = True
    hits = (adj & active[None, :]).sum(axis=1).astype(np.int64)
    new = active | ((deg > 0) & (2 * hits >= deg))
    assert new.sum() == 1  # nothing activates


def test_fractional_knapsack_quantized_ratio_order():
    # doc A: 10 distinct / 10 tokens (ratio 1e6), doc B: 5/10 (5e5),
    # doc C: 9/10 (9e5); budget 15 -> A full, C fractional 50%
    docs = [(1, 10, 10), (2, 5, 10), (3, 9, 10)]
    budget = 15
    ranked = sorted(docs, key=lambda r: (-(r[1] * 1_000_000 // r[2]),
                                         r[0]))
    used = score = nfull = 0
    frac = None
    for d, dt, w in ranked:
        if used + w <= budget:
            used += w
            score += dt
            nfull += 1
        else:
            frac = (d, (budget - used) * 1_000_000 // w)
            break
    assert (nfull, used, score) == (1, 10, 10)
    assert frac == (3, 500_000)


def test_page_cusum_prefix_identity_equals_recursion():
    rng = np.random.default_rng(17)
    x = rng.integers(-50, 45, 300)
    # direct recursion
    s_ref, s = [], 0
    for v in x:
        s = max(0, s + int(v))
        s_ref.append(s)
    # prefix identity
    p = np.cumsum(x)
    cmin = np.minimum.accumulate(p)
    s_id = p - np.minimum(cmin, 0)
    assert s_id.tolist() == s_ref


def test_page_cusum_step_shift_alarms_after_shift():
    # flat at 0 for 50 days, then +10/day drift with h=30: alarm fires
    # a few days after the shift, never before
    x = np.array([0] * 50 + [10] * 20)
    p = np.cumsum(x)
    s = p - np.minimum(np.minimum.accumulate(p), 0)
    alarms = s >= 30
    assert not alarms[:50].any()
    assert int(np.argmax(alarms)) == 52  # 3rd day of the shift


def test_mcnemar_cells_partition_and_statistic():
    # personal right on 30, global right on 10 of the discordant set
    b, c = 30, 10
    chi2 = (b - c) ** 2 * 1_000_000 // (b + c)
    assert chi2 == 400 * 1_000_000 // 40
    # agreeing predictors contribute nothing discordant
    assert ((5 - 5) ** 2) == 0


def test_largest_remainder_allocation_sums_exactly():
    splits = (("train", 80), ("val", 10), ("test", 10))
    for n in (1, 7, 10, 99, 100, 101, 12345):
        floors = [(nm, n * w // 100, (n * w) % 100) for nm, w in splits]
        left = n - sum(f[1] for f in floors)
        by_rem = sorted(range(3), key=lambda i: (-floors[i][2], i))
        alloc = [f[1] for f in floors]
        for i in by_rem[:left]:
            alloc[i] += 1
        assert sum(alloc) == n          # exact partition, always
        assert all(a >= 0 for a in alloc)
        # proportional within 1 of the ideal share
        for (nm, w), a in zip(splits, alloc):
            assert abs(a - n * w / 100) < 1


def test_largest_remainder_tie_prefers_split_order():
    # n=5: shares 4.0/0.5/0.5 -> floors 4/0/0, 1 leftover, remainders
    # 0/50/50 tie -> val (earlier split order) gets it
    n = 5
    splits = (("train", 80), ("val", 10), ("test", 10))
    floors = [(nm, n * w // 100, (n * w) % 100) for nm, w in splits]
    left = n - sum(f[1] for f in floors)
    by_rem = sorted(range(3), key=lambda i: (-floors[i][2], i))
    alloc = [f[1] for f in floors]
    for i in by_rem[:left]:
        alloc[i] += 1
    assert alloc == [4, 1, 0]


def test_iv_wald_perfect_compliance_equals_itt():
    # when exposure == assignment exactly, LATE == ITT difference
    n0 = n1 = 100
    y0, y1 = 50_000, 65_000
    x0, x1 = 0, 100  # nobody/everybody exposed
    num = y1 / n1 - y0 / n0
    den = x1 / n1 - x0 / n0
    assert den == 1.0
    assert abs(num / den - 150.0) < 1e-9


def test_survivorship_rule_max_balance_then_min_key():
    members = [(5, 100), (3, 250), (9, 250)]  # (custkey, bal)
    bal_of = dict(members)
    best = min(bal_of, key=lambda k: (-bal_of[k], k))
    assert best == 3  # balance tie -> smaller custkey


def test_survivorship_clusters_via_components():
    from log_analysis_ai_ray.stages.graph import connected_components
    import pyarrow as pa_
    pairs = pa_.table({"a": pa_.array([1, 2, 7], pa_.int64()),
                       "b": pa_.array([2, 3, 8], pa_.int64())})
    comp = connected_components(pairs, src="a", dst="b")
    node = comp.column(comp.column_names[0]).to_pylist()
    root = comp.column(comp.column_names[1]).to_pylist()
    lab = dict(zip(node, root))
    assert lab[1] == lab[2] == lab[3] == 1
    assert lab[7] == lab[8] == 7


def test_adjacent_bigram_counts_block_invariant():
    # counting adjacency inside one flattened (parent, token) stream:
    # pairs never cross document boundaries
    fp = np.array([0, 0, 0, 1, 1, 2], dtype=np.int64)
    fl = np.array(["a", "b", "a", "b", "a", "a"])
    same = fp[1:] == fp[:-1]
    w1, w2 = fl[:-1][same], fl[1:][same]
    pairs = list(zip(w1.tolist(), w2.tolist()))
    assert pairs == [("a", "b"), ("b", "a"), ("b", "a")]
    # no pair between doc0's last token and doc1's first
    assert ("a", "b") not in pairs[1:]


def test_median_from_histogram_matches_duckdb_semantics():
    # even count: average of the two middle order statistics
    vals = np.array([1, 1, 3, 9], dtype=np.int64)
    vu, cc = np.unique(vals, return_counts=True)
    n = int(cc.sum())
    cum = np.cumsum(cc)
    lo = int(vu[np.searchsorted(cum, (n + 1) // 2)])
    hi = int(vu[np.searchsorted(cum, n // 2 + 1)])
    assert (lo + hi) / 2.0 == 2.0  # (1+3)/2
    # odd count: the middle element itself
    vals = np.array([1, 3, 9], dtype=np.int64)
    vu, cc = np.unique(vals, return_counts=True)
    n = int(cc.sum())
    cum = np.cumsum(cc)
    lo = int(vu[np.searchsorted(cum, (n + 1) // 2)])
    hi = int(vu[np.searchsorted(cum, n // 2 + 1)])
    assert (lo + hi) / 2.0 == 3.0


def test_central_moment_identities_match_numpy():
    rng = np.random.default_rng(19)
    y = rng.integers(0, 50, 500).astype(np.int64)
    n = len(y)
    s1, s2 = int(y.sum()), int((y * y).sum())
    s3, s4 = int((y ** 3).sum()), int((y ** 4).sum())
    m2n = n * s2 - s1 * s1
    m3n = n * n * s3 - 3 * n * s1 * s2 + 2 * s1 ** 3
    m4n = n ** 3 * s4 - 4 * n * n * s1 * s3 \
        + 6 * n * s1 * s1 * s2 - 3 * s1 ** 4
    yf = y.astype(float)
    mu = yf.mean()
    assert abs(m2n / n ** 2 - ((yf - mu) ** 2).mean()) < 1e-6
    assert abs(m3n / n ** 3 - ((yf - mu) ** 3).mean()) < 1e-5
    assert abs(m4n / n ** 4 - ((yf - mu) ** 4).mean()) < 1e-4
    skew = m3n / m2n ** 1.5
    skew_ref = (((yf - mu) ** 3).mean()
                / (((yf - mu) ** 2).mean()) ** 1.5)
    assert abs(skew - skew_ref) < 1e-9


def test_normalish_kurtosis_near_zero_uniform_negative():
    # uniform distribution: excess kurtosis = -1.2 exactly in the limit
    y = np.arange(10000, dtype=np.int64) % 100
    n = len(y)
    s1, s2 = int(y.sum()), int((y * y).sum())
    s4 = int((y.astype(object) ** 4).sum())
    s3 = int((y.astype(object) ** 3).sum())
    m2n = n * s2 - s1 * s1
    m4n = n ** 3 * s4 - 4 * n * n * s1 * s3 \
        + 6 * n * s1 * s1 * s2 - 3 * s1 ** 4
    kurt = m4n / m2n ** 2 - 3.0
    assert abs(kurt + 1.2) < 0.01


def test_ensemble_majority_suppresses_single_votes():
    votes = np.array([3, 2, 1, 0, 2])
    assert int((votes >= 2).sum()) == 3
    assert int((votes >= 3).sum()) == 1


def test_markov_removal_effect_toy_chain():
    from log_analysis_ai_ray.pipelines.queries_ext import \
        _markov_conv_prob
    # all journeys: S -> click -> conv. Removing click kills ALL
    # conversion; removing an untouched channel changes nothing.
    counts = {("S", "click"): 10, ("click", "conv"): 10}
    base = _markov_conv_prob(counts, None)
    assert abs(base - 1.0) < 1e-12
    assert _markov_conv_prob(counts, "click") == 0.0
    assert abs(_markov_conv_prob(counts, "view") - base) < 1e-12


def test_markov_conv_prob_partial_paths():
    from log_analysis_ai_ray.pipelines.queries_ext import \
        _markov_conv_prob
    # S -> click (p=1); click -> conv (p=.5), click -> null (p=.5)
    counts = {("S", "click"): 4, ("click", "conv"): 2,
              ("click", "null"): 2}
    assert abs(_markov_conv_prob(counts, None) - 0.5) < 1e-12


def test_markov_absorbing_conv_accumulates():
    from log_analysis_ai_ray.pipelines.queries_ext import \
        _markov_conv_prob
    # two-hop and one-hop converters both counted within 8 steps
    counts = {("S", "click"): 2, ("S", "view"): 2,
              ("click", "conv"): 2,
              ("view", "click"): 2}
    # S->click->conv (.5) + S->view->click->conv (.5) = 1.0
    assert abs(_markov_conv_prob(counts, None) - 1.0) < 1e-12
    # removing view kills only the two-hop half
    assert abs(_markov_conv_prob(counts, "view") - 0.5) < 1e-12


def _viterbi(cv, p25, p75, k):
    c0, c1 = abs(cv[0] - p25), abs(cv[0] - p75)
    h0, h1 = 0, 1
    for t in range(1, len(cv)):
        e0, e1 = abs(cv[t] - p25), abs(cv[t] - p75)
        n0, nh0 = (c0 + e0, h0) if c0 <= c1 + k else (c1 + k + e0, h1)
        n1, nh1 = (c1 + e1, h1 + 1) if c1 <= c0 + k \
            else (c0 + k + e1, h0 + 1)
        c0, c1, h0, h1 = n0, n1, nh0, nh1
    return (c0, h0) if c0 <= c1 else (c1, h1)


def test_viterbi_matches_bruteforce_enumeration():
    import itertools
    rng = np.random.default_rng(21)
    cv = [int(v) for v in rng.integers(0, 40, 10)]
    p25, p75, k = 10, 30, 10
    best = None
    for states in itertools.product([0, 1], repeat=len(cv)):
        cost = sum(abs(c - (p75 if s else p25))
                   for c, s in zip(cv, states))
        cost += k * sum(1 for a, b in zip(states, states[1:])
                        if a != b)
        if best is None or cost < best[0]:
            best = (cost, sum(states))
    got_cost, _got_hot = _viterbi(cv, p25, p75, k)
    assert got_cost == best[0]


def test_viterbi_switch_penalty_suppresses_flicker():
    # alternating counts with huge K: the chain never switches
    cv = [10, 30, 10, 30, 10]
    cost_bigk, hot_bigk = _viterbi(cv, 10, 30, 1000)
    assert hot_bigk in (0, 5)  # one regime for the whole series
    # with zero K it follows the emissions exactly
    cost_k0, hot_k0 = _viterbi(cv, 10, 30, 0)
    assert (cost_k0, hot_k0) == (0, 2)


def test_mcc_perfect_and_random_classifier():
    import math

    def mcc(cells):  # {(true, pred): n}
        s = sum(cells.values())
        c = sum(n for (t, p), n in cells.items() if t == p)
        labels = sorted({k for pair in cells for k in pair})
        tsum = psum = tp = 0
        for k in labels:
            t_k = sum(n for (t, _p), n in cells.items() if t == k)
            p_k = sum(n for (_t, p), n in cells.items() if p == k)
            tsum += t_k * t_k
            psum += p_k * p_k
            tp += t_k * p_k
        num = c * s - tp
        den = math.sqrt(s * s - psum) * math.sqrt(s * s - tsum)
        return num / den if den else None
    perfect = {("a", "a"): 50, ("b", "b"): 50}
    assert abs(mcc(perfect) - 1.0) < 1e-12
    # independent predictions: MCC == 0 exactly when joint = product
    indep = {("a", "a"): 25, ("a", "b"): 25,
             ("b", "a"): 25, ("b", "b"): 25}
    assert abs(mcc(indep)) < 1e-12
    inverted = {("a", "b"): 50, ("b", "a"): 50}
    assert abs(mcc(inverted) + 1.0) < 1e-12


def test_mmr_prefers_diverse_second_pick():
    # a best-aligned to the query, b an exact CLONE of a, c orthogonal
    # to a yet still query-relevant: MMR picks a, then c beats the
    # clone (b pays full redundancy 1.0, c pays none)
    q = np.array([0.8, 0.6])
    vecs = {1: np.array([1.0, 0.0]), 2: np.array([1.0, 0.0]),
            3: np.array([0.0, 1.0])}
    lam = 0.7
    sel = []
    for _ in range(2):
        best = None
        for vid, v in sorted(vecs.items()):
            if vid in sel:
                continue
            rel = float(v @ q)
            red = max((float(v @ vecs[s]) for s in sel), default=0.0)
            score = round(lam * rel - (1 - lam) * red, 6)
            key = (-score, vid)
            if best is None or key < best[0]:
                best = (key, vid)
        sel.append(best[1])
    assert sel == [1, 3]


def test_nelson_aalen_vs_km_relationship():
    # H(t) = sum d/n; survival exp(-H) >= KM product-limit (both
    # decreasing, NA slightly above KM for small d/n)
    import math
    d = [2, 1, 3]
    n = [10, 8, 7]
    H = 0.0
    S_km = 1.0
    for di, ni in zip(d, n):
        H += di / ni
        S_km *= 1 - di / ni
    assert math.exp(-H) >= S_km - 1e-12
    assert abs(H - (0.2 + 0.125 + 3 / 7)) < 1e-12


def test_walkforward_selection_switches_models():
    # seasonal series with period 7: the seasonal predictor wins once
    # enough training evidence accumulates
    base = [100, 200, 300, 400, 500, 600, 700]
    y = np.array(base * 5, dtype=np.int64)
    e_p = np.abs(y[7:] - y[6:-1])
    e_s = np.abs(y[7:] - y[:-7])
    assert int(e_s.sum()) == 0          # perfect seasonal fit
    cum_p = np.cumsum(e_p)
    cum_s = np.cumsum(e_s)
    # at the second eligible day the cumulative evidence picks seasonal
    assert cum_s[0] <= cum_p[0]
    chosen_err = []
    for i in range(len(e_p) - 10, len(e_p)):
        tp = int(cum_p[i - 1]) if i > 0 else 0
        ts = int(cum_s[i - 1]) if i > 0 else 0
        chosen_err.append(int(e_s[i] if ts < tp else e_p[i])
                          if tp > ts else int(e_p[i]))
    # seasonal chosen everywhere in the test window -> zero error
    assert sum(int(e_s[i]) for i in range(len(e_p) - 10, len(e_p))) \
        == 0


def test_trunc_div_mirrors_duckdb():
    from log_analysis_ai_ray.pipelines.queries_ext import _trunc_div
    assert _trunc_div(7, 2) == 3
    assert _trunc_div(-7, 2) == -3      # Python // would give -4
    assert _trunc_div(7, -2) == -3
    assert _trunc_div(-7, -2) == 3


def test_shift_share_components_close():
    # competitive shifts sum to (T2-T1) - sum(expected); with exact
    # division they'd sum to 0 - integer trunc leaves only rounding
    r1 = np.array([100, 250, 650], dtype=np.int64)
    r2 = np.array([120, 240, 700], dtype=np.int64)
    t1, t2 = int(r1.sum()), int(r2.sum())
    from log_analysis_ai_ray.pipelines.queries_ext import _trunc_div
    exp = [_trunc_div(int(a) * (t2 - t1), t1) for a in r1]
    shift = [int(b) - int(a) - e for a, b, e in zip(r1, r2, exp)]
    assert abs(sum(shift)) <= len(r1)  # only trunc remainders


def test_quintile_rank_formula_balanced():
    # the positional formula assigns ~n/5 per bucket deterministically
    n = 103
    rank0 = np.arange(n)
    s = 1 + rank0 * 5 // n
    counts = np.bincount(s)[1:]
    assert counts.sum() == n
    assert counts.max() - counts.min() <= 1


def test_huber_integer_weights_bounded_and_monotone():
    # weights: exactly 1e6 inside the k-band, strictly less outside,
    # decreasing with distance
    k = 50
    d = np.array([0, 25, 50, 51, 100, 500])
    w = np.where(d <= k, 1_000_000,
                 [k * 1_000_000 // max(int(x), 1) for x in d])
    assert w[0] == w[1] == w[2] == 1_000_000
    assert w[3] < 1_000_000
    assert all(int(w[i]) >= int(w[i + 1]) for i in range(len(w) - 1))


def test_huber_pulls_less_than_mean_toward_outlier():
    vals = np.array([10] * 50 + [1000], dtype=np.int64)
    mean = int(vals.sum()) // len(vals)
    med = 10
    k = 1  # MAD of this sample is 0 -> clamped to 1
    d = np.abs(vals - med)
    w = np.where(d <= k, 1_000_000,
                 [k * 1_000_000 // max(int(x), 1) for x in d])
    hub = int((vals * w).sum()) // int(w.sum())
    assert abs(hub - med) < abs(mean - med)


def test_inverse_simpson_bounds():
    # all mass one type -> D2 == 1; uniform over k types -> D2 == k
    c = np.array([100], dtype=object)
    n = int(c.sum())
    assert n * n * 1_000_000 // int((c ** 2).sum()) == 1_000_000
    c = np.array([25, 25, 25, 25], dtype=object)
    n = int(c.sum())
    assert n * n * 1_000_000 // int((c ** 2).sum()) == 4_000_000


def test_scan_statistic_prefix_rect_sums():
    # row 0 is the unused dow slot and MUST stay zero: rect() with
    # d1 == 1 never subtracts it (the query's grid honors this)
    g = np.arange(1, 8 * 24 + 1).reshape(8, 24)
    g[0, :] = 0
    p = g.cumsum(axis=0).cumsum(axis=1)

    def rect(d1, d2, h1, h2):
        s = int(p[d2, h2])
        if d1 > 1:
            s -= int(p[d1 - 1, h2])
        if h1 > 0:
            s -= int(p[d2, h1 - 1])
        if d1 > 1 and h1 > 0:
            s += int(p[d1 - 1, h1 - 1])
        return s
    assert rect(2, 4, 3, 7) == int(g[2:5, 3:8].sum())
    assert rect(1, 7, 0, 23) == int(g[1:8, :].sum())


def test_scan_llr_peaks_on_planted_hotspot():
    import math
    ce = np.full((8, 24), 1, dtype=np.int64)
    cb = np.full((8, 24), 100, dtype=np.int64)
    ce[0, :] = 0
    cb[0, :] = 0
    ce[3, 10] = 50                        # planted spike
    C, B = int(ce.sum()), int(cb.sum())

    def llr(c, b):
        e = C * b / B
        if c > e and c > 0:
            v = c * math.log(c / e)
            if C - c > 0:
                v += (C - c) * math.log((C - c) / (C - e))
            return round(1_000_000 * v)
        return 0
    spike = llr(int(ce[3, 10]), int(cb[3, 10]))
    normal = llr(int(ce[3, 11]), int(cb[3, 11]))
    whole = llr(C, B)
    assert spike > 0
    assert normal == 0                    # c == e·1 -> not over
    assert whole == 0                     # full window is never a
    assert spike > whole                  # hotspot


def test_side_tagged_nation_join_close():
    # order rows tagged cents=-1; lineitem partials join on orderkey
    # and must match BOTH key and nation to count (the Q5 predicate)
    ok = np.array([1, 2, 3, 1, 2, 3], dtype=np.int64)
    nt = np.array([7, 8, 9, 7, 9, 9], dtype=np.int64)
    cents = np.array([-1, -1, -1, 100, 200, 300], dtype=np.int64)
    is_ord = cents < 0
    o_keys, o_nat = ok[is_ord], nt[is_ord]
    oo = np.argsort(o_keys)
    o_keys, o_nat = o_keys[oo], o_nat[oo]
    li = ~is_ord
    pos = np.clip(np.searchsorted(o_keys, ok[li]), 0, len(o_keys) - 1)
    same = (o_keys[pos] == ok[li]) & (o_nat[pos] == nt[li])
    # order1 nation7 matches li(1,7,100); order2 nation8 vs li(2,9) NO;
    # order3 nation9 matches li(3,9,300)
    assert cents[li][same].tolist() == [100, 300]
    assert nt[li][same].tolist() == [7, 9]


def test_price_index_identities():
    # identical prices between halves -> all three indices == 1
    p1 = np.array([100, 250], dtype=object)
    p2 = p1.copy()
    q1 = np.array([10, 4], dtype=object)
    q2 = np.array([3, 9], dtype=object)
    lasp = int((p2 * q1).sum()) * 1000 // int((p1 * q1).sum())
    paas = int((p2 * q2).sum()) * 1000 // int((p1 * q2).sum())
    assert lasp == paas == 1000
    # uniform 10% inflation -> both 1100 per-mille exactly
    p2 = np.array([110, 275], dtype=object)
    lasp = int((p2 * q1).sum()) * 1000 // int((p1 * q1).sum())
    paas = int((p2 * q2).sum()) * 1000 // int((p1 * q2).sum())
    assert lasp == paas == 1100


def _kendalls_w(count_rows):
    # count_rows: list of per-judge count arrays over the same items
    m = len(count_rows)
    n = len(count_rows[0])
    r2_sums = np.zeros(n, dtype=object)
    tie_sum = 0
    for c in count_rows:
        c = np.asarray(c, dtype=np.int64)
        o = np.argsort(c, kind="stable")
        sc = c[o]
        r2 = np.zeros(n, dtype=np.int64)
        i = 0
        while i < n:
            j = i
            while j + 1 < n and sc[j + 1] == sc[i]:
                j += 1
            r2[o[i:j + 1]] = (i + 1) + (j + 1)
            t = j - i + 1
            tie_sum += t ** 3 - t
            i = j + 1
        r2_sums += r2
    mean2 = m * (n + 1)
    s4 = int(sum((int(x) - mean2) ** 2 for x in r2_sums))
    den = m * m * (n ** 3 - n) - m * tie_sum
    return 3 * s4 / den


def test_kendalls_w_perfect_agreement():
    judges = [[10, 20, 30, 40]] * 5
    assert abs(_kendalls_w(judges) - 1.0) < 1e-12


def test_kendalls_w_two_reversed_judges_zero():
    assert abs(_kendalls_w([[1, 2, 3, 4], [4, 3, 2, 1]])) < 1e-12


def test_kendalls_w_between_bounds():
    rng = np.random.default_rng(23)
    judges = [rng.permutation(10) for _ in range(4)]
    w = _kendalls_w(judges)
    assert 0.0 <= w <= 1.0


def test_theil_decomposition_identity():
    import math
    # two groups with different means: T == T_between + sum s_g T_g
    groups = {"a": [(100, 5), (200, 5)], "b": [(400, 10)]}
    tot = sum(v * c for g in groups.values() for v, c in g)
    n = sum(c for g in groups.values() for _, c in g)
    mu = tot / n

    def theil(cells, mean):
        s = sum(c * (v / mean) * math.log(v / mean) for v, c in cells)
        return s / sum(c for _, c in cells)

    t_total = theil([x for g in groups.values() for x in g], mu)
    t_b = t_w = 0.0
    for g in groups.values():
        tg = sum(v * c for v, c in g)
        ng = sum(c for _, c in g)
        mug = tg / ng
        share = tg / tot
        t_b += share * math.log(mug / mu)
        t_w += share * theil(g, mug)
    assert abs(t_total - (t_b + t_w)) < 1e-12
    # equal values everywhere -> zero inequality
    assert abs(theil([(50, 10)], 50.0)) < 1e-12


def test_granger_cramer_solves_normal_equations():
    rng = np.random.default_rng(29)
    x = rng.integers(0, 100, 60).astype(np.int64)
    z = rng.integers(0, 100, 60).astype(np.int64)
    y = (3 * x + 2 * z + 7 + rng.integers(-5, 6, 60)).astype(np.int64)
    n = len(y)
    sy, sx, sz = int(y.sum()), int(x.sum()), int(z.sum())
    sxx = int((x * x).sum()); szz = int((z * z).sum())
    sxz = int((x * z).sum()); sxy = int((x * y).sum())
    szy = int((z * y).sum())
    det = (n * (sxx * szz - sxz * sxz) - sx * (sx * szz - sxz * sz)
           + sz * (sx * sxz - sxx * sz))
    da = (sy * (sxx * szz - sxz * sxz) - sx * (sxy * szz - sxz * szy)
          + sz * (sxy * sxz - sxx * szy))
    db = (n * (sxy * szz - sxz * szy) - sy * (sx * szz - sxz * sz)
          + sz * (sx * szy - sxy * sz))
    dc = (n * (sxx * szy - sxy * sxz) - sx * (sx * szy - sxy * sz)
          + sy * (sx * sxz - sxx * sz))
    a, b, c = da / det, db / det, dc / det
    # numpy lstsq reference
    X = np.column_stack([np.ones(n), x, z]).astype(float)
    beta = np.linalg.lstsq(X, y.astype(float), rcond=None)[0]
    assert abs(a - beta[0]) < 1e-6
    assert abs(b - beta[1]) < 1e-8
    assert abs(c - beta[2]) < 1e-8


def test_granger_f_zero_when_z_is_noise_free_irrelevant():
    # y depends only on x: adding z can only reduce SSE a little ->
    # F small; y depends on z strongly -> F large
    rng = np.random.default_rng(31)
    x = rng.integers(0, 100, 200).astype(float)
    z = rng.integers(0, 100, 200).astype(float)
    y1 = 5 * x + rng.normal(0, 1, 200)
    y2 = 5 * z + rng.normal(0, 1, 200)

    def f_stat(y):
        n = len(y)
        X_r = np.column_stack([np.ones(n), x])
        X_f = np.column_stack([np.ones(n), x, z])
        sse_r = float(((y - X_r @ np.linalg.lstsq(
            X_r, y, rcond=None)[0]) ** 2).sum())
        sse_f = float(((y - X_f @ np.linalg.lstsq(
            X_f, y, rcond=None)[0]) ** 2).sum())
        return (sse_r - sse_f) / (sse_f / (n - 3))
    assert f_stat(y1) < 5
    assert f_stat(y2) > 1000


def test_forecast_reconciliation_coherence():
    # Hamilton allocation of any total over any positive weights sums
    # exactly to the total
    tot_fc = 123457
    weights = {"a": 3, "b": 5, "c": 9}
    wt = sum(weights.values())
    keys = sorted(weights)
    floors = [(k, tot_fc * weights[k] // wt, (tot_fc * weights[k]) % wt)
              for k in keys]
    left = tot_fc - sum(f[1] for f in floors)
    by_rem = sorted(range(3), key=lambda i: (-floors[i][2], i))
    alloc = [f[1] for f in floors]
    for i in by_rem[:left]:
        alloc[i] += 1
    assert sum(alloc) == tot_fc


def test_nb_moments_recover_known_parameters():
    # NB(r=4, p=0.4): mean = r(1-p)/p = 6, var = r(1-p)/p^2 = 15
    mu, var = 6.0, 15.0
    r = mu * mu / (var - mu)
    p = mu / var
    assert abs(r - 4.0) < 1e-12
    assert abs(p - 0.4) < 1e-12


def test_kupiec_lr_zero_at_exact_rate_and_grows():
    import math

    def lr_pof(n, x, p=0.05):
        xh = x / n
        return -2.0 * ((n - x) * math.log((1 - p) / (1 - xh))
                       + x * math.log(p / xh))
    # violations exactly at the model rate -> LR == 0
    assert abs(lr_pof(200, 10)) < 1e-12
    # too many OR too few violations both inflate the statistic
    assert lr_pof(200, 30) > 10
    assert lr_pof(200, 1) > 5


def test_bh_stepup_classic_example():
    # textbook BH at q=0.05: sorted p-values, reject up to max i with
    # p_i <= q*i/m (integer p12 comparison mirrors the engines)
    ps = [0.001, 0.008, 0.039, 0.041, 0.042, 0.06, 0.074, 0.205]
    m = len(ps)
    p12 = [round(p * 1e12) for p in ps]
    kstar = 0
    for i, v in enumerate(sorted(p12), start=1):
        if v * 20 * m <= 10**12 * i:
            kstar = i
    # p4=0.041 <= 0.05*4/8=0.025? no. p3=0.039<=0.01875? no.
    # p2=0.008<=0.0125 yes -> but step-up takes the MAX i, check each:
    # i=1: .001<=.00625 y; i=2: .008<=.0125 y; i=3: .039<=.01875 n;
    # i=4: .041<=.025 n; i=5: .042<=.03125 n -> kstar=2
    assert kstar == 2


def test_poisson_upper_tail_terms_stable():
    import math
    lam = 2500.0  # large rate: early terms underflow harmlessly
    # P(X >= mode) should be ~0.5, mode terms well-formed
    c = 2500
    cdf = sum(math.exp(k * math.log(lam) - lam - math.lgamma(k + 1))
              for k in range(c))
    p = 1.0 - cdf
    assert 0.4 < p < 0.6
    # a +5 sigma cell is a discovery-grade p-value
    c_hi = int(lam + 5 * lam ** 0.5)
    cdf_hi = sum(math.exp(k * math.log(lam) - lam - math.lgamma(k + 1))
                 for k in range(c_hi))
    assert 1.0 - cdf_hi < 1e-5


def test_chapman_exact_under_full_overlap_and_underestimates_disjoint():
    # full overlap: est == true
    n1 = n2 = m = t = 100
    est = (n1 + 1) * (n2 + 1) // (m + 1) - 1
    assert est == 100
    # independent captures with 50% each: unbiased-ish around true
    t = 1000
    n1 = n2 = 500
    m = 250  # expected overlap under independence
    est = (n1 + 1) * (n2 + 1) // (m + 1) - 1
    assert abs(est - t) < t * 0.01


def test_good_turing_bounds():
    # all singletons -> unseen mass 1000pm; no singletons -> 0
    cnts = np.array([1, 1, 1], dtype=np.int64)
    assert int((cnts == 1).sum()) * 1000 // int(cnts.sum()) == 1000
    cnts = np.array([5, 9], dtype=np.int64)
    assert int((cnts == 1).sum()) * 1000 // int(cnts.sum()) == 0


def test_ari_identical_partitions_one_independent_zeroish():
    def ari(cells):
        import numpy as _np
        la = [t for (t, _p) in cells]
        pr = [p for (_t, p) in cells]
        nn = list(cells.values())
        n = sum(nn)

        def c2(x):
            return x * (x - 1) // 2
        sij = sum(c2(v) for v in nn)
        sa = sum(c2(sum(v for (t, _), v in cells.items() if t == k))
                 for k in set(la))
        sb = sum(c2(sum(v for (_, p), v in cells.items() if p == k))
                 for k in set(pr))
        cn2 = c2(n)
        num = sij * cn2 - sa * sb
        den = (sa + sb) * cn2 // 2 - sa * sb
        return num / den
    assert abs(ari({("a", "a"): 50, ("b", "b"): 50}) - 1.0) < 1e-12
    # independent 2x2 with equal masses: near zero (ARI is zero in
    # EXPECTATION over the permutation null; a single balanced table
    # sits O(1/n) below it)
    assert abs(ari({("a", "a"): 25, ("a", "b"): 25,
                    ("b", "a"): 25, ("b", "b"): 25})) < 0.05
    # inverted labels on 2 clusters still pair-agree perfectly
    assert abs(ari({("a", "b"): 50, ("b", "a"): 50}) - 1.0) < 1e-12


def test_average_precision_perfect_and_worst_ranking():
    def ap_from_hist(scores_desc):
        # list of (pos, neg) per distinct score, descending
        P = sum(p for p, _ in scores_desc)
        ctp = call = 0
        ap = 0.0
        for p, ng in scores_desc:
            ctp += p
            call += p + ng
            if p:
                ap += p * (ctp / call)
        return ap / P
    # all positives above all negatives -> AP == 1
    assert abs(ap_from_hist([(5, 0), (0, 10)]) - 1.0) < 1e-12
    # all negatives first -> AP == P/(N+P) at the single positive bin
    ap = ap_from_hist([(0, 9), (1, 0)])
    assert abs(ap - 0.1) < 1e-12


def test_l1_profile_motif_identical_days_zero():
    prof = np.array([[1, 2, 3], [1, 2, 3], [9, 9, 9]], dtype=np.int64)
    i, j = np.triu_indices(3, 1)
    dist = np.abs(prof[i] - prof[j]).sum(axis=1)
    best = np.argmin(dist)
    assert (i[best], j[best]) == (0, 1)
    assert dist[best] == 0


def test_ljung_box_white_noise_small_seasonal_large():
    rng = np.random.default_rng(37)

    def q_stat(y, lags=6):
        n = len(y)
        s = int(y.sum())
        yn = [int(v) * n - s for v in y]
        c0 = sum(v * v for v in yn)
        q = 0.0
        for k in range(1, lags + 1):
            ck = sum(yn[t] * yn[t + k] for t in range(n - k))
            q += (ck / c0) ** 2 / (n - k)
        return q * n * (n + 2)
    noise = rng.integers(0, 1000, 300).astype(np.int64)
    # period-3 signal puts its peak INSIDE the tested lag window
    seasonal = np.tile([0, 0, 1000], 100)
    assert q_stat(noise) < 30        # chi2(6) 99.99% ~ 27.8
    assert q_stat(seasonal) > 500    # lag-3/6 structure dominates


def test_kadane_prefix_identity_matches_bruteforce():
    rng = np.random.default_rng(41)
    for _ in range(5):
        x = rng.integers(-50, 50, 40).astype(object)
        p = np.cumsum(x)
        pmin_prior = np.concatenate(([0],
                                     np.minimum.accumulate(p)[:-1]))
        base = np.minimum(pmin_prior, 0)
        gain = p - base
        got = int(max(gain))
        # brute force max subarray (non-empty)
        best = None
        for i in range(len(x)):
            for j in range(i, len(x)):
                ssum = int(sum(x[i:j + 1]))
                best = ssum if best is None else max(best, ssum)
        # identity allows the empty-prefix start: matches when the
        # best subarray is positive (demeaned series always has one)
        assert got == max(best, int(max(p)))


def test_kahn_peeling_layers_and_cycle():
    # chain 0->1->2 plus cycle 3<->4: layers peel the chain, the
    # cycle survives every round
    n = 5
    a = np.zeros((n, n), dtype=bool)
    a[0, 1] = a[1, 2] = True
    a[3, 4] = a[4, 3] = True
    alive = np.ones(n, dtype=bool)
    layer = np.full(n, -1, dtype=np.int64)
    for r in range(1, 7):
        indeg = (a & alive[:, None] & alive[None, :]).sum(axis=0)
        removable = alive & (indeg == 0)
        if not removable.any():
            break
        layer[removable] = r
        alive &= ~removable
    assert layer[0] == 1 and layer[1] == 2 and layer[2] == 3
    assert alive[3] and alive[4]          # the cycle remains
    assert int(alive.sum()) == 2


def test_duplicate_invoice_pair_count_matches_bruteforce():
    rng = np.random.default_rng(43)
    ck = rng.integers(0, 5, 80)
    cv = rng.integers(0, 3, 80) * 100   # few distinct amounts
    dy = rng.integers(0, 20, 80)
    # brute force over unordered pairs
    ref = sum(1 for i in range(80) for j in range(i + 1, 80)
              if ck[i] == ck[j] and cv[i] == cv[j]
              and abs(int(dy[i]) - int(dy[j])) <= 3)
    # run-sorted two-pointer form
    order = np.lexsort((dy, cv, ck))
    c, v, d = ck[order], cv[order], dy[order]
    pairs = 0
    rs = 0
    n = len(c)
    for i in range(1, n + 1):
        if i == n or c[i] != c[rs] or v[i] != v[rs]:
            if i - rs >= 2:
                dd = d[rs:i]
                hi = np.searchsorted(dd, dd + 3, side="right")
                pairs += int((hi - np.arange(1, len(dd) + 1)).sum())
            rs = i
    assert pairs == ref


def test_bradley_terry_dominant_player_strongest():
    # type A beats everyone every day: strength must rank first
    k = 3
    w = np.array([[0, 10, 10], [0, 0, 5], [0, 5, 0]], dtype=np.int64)
    n_ij = w + w.T
    p = np.ones(k)
    for _ in range(3):
        newp = np.zeros(k)
        for i in range(k):
            den = sum(n_ij[i, j] / (p[i] + p[j])
                      for j in range(k) if j != i)
            newp[i] = w[i].sum() / den if den else 0.0
        p = np.round(newp * (k / newp.sum()), 6)
    assert p[0] > p[1] and p[0] > p[2]
    assert abs(p[1] - p[2]) < 1e-6      # symmetric tail players tie


def test_hurst_random_walk_near_half():
    import math
    rng = np.random.default_rng(47)
    y = rng.integers(-100, 101, 2048).astype(np.int64)  # iid noise
    pts = []
    for s in (8, 16, 32):
        nb = len(y) // s
        acc = 0.0
        for b in range(nb):
            blk = [int(v) for v in y[b * s:(b + 1) * s]]
            sb, qb = sum(blk), sum(v * v for v in blk)
            cum = zmin = zmax = 0
            for t, v in enumerate(blk, start=1):
                cum += v
                z = s * cum - t * sb
                zmin, zmax = min(zmin, z), max(zmax, z)
            var_s = s * qb - sb * sb
            if var_s > 0:
                acc += (zmax - zmin) / math.sqrt(var_s)
        pts.append((math.log(s), math.log(acc / nb)))
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(v for _, v in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * v for x, v in pts)
    h = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert 0.35 < h < 0.65              # iid noise ~ 0.5


def test_two_nn_intrinsic_dim_recovers_line_and_plane():
    import math
    rng = np.random.default_rng(53)

    def id_est(x):
        n = len(x)
        sq = ((x[:, None, :] - x[None, :, :]) ** 2).sum(axis=2)
        np.fill_diagonal(sq, np.inf)
        s = 0.0
        for i in range(n):
            o = np.argsort(sq[i])
            s += 0.5 * math.log(sq[i][o[1]] / sq[i][o[0]])
        return n / s
    # points on a 1-D line embedded in 8-D
    t = rng.uniform(0, 100, 300)
    line = np.outer(t, rng.normal(0, 1, 8))
    assert 0.7 < id_est(line) < 1.4
    # points on a 2-D plane embedded in 8-D
    uv = rng.uniform(0, 100, (300, 2))
    basis = rng.normal(0, 1, (2, 8))
    plane = uv @ basis
    assert 1.5 < id_est(plane) < 2.8


def test_adaptation_bursty_vs_uniform():
    # bursty term: appears twice whenever it appears; uniform: once
    df1_b, df2_b = 50, 50
    df1_u, df2_u = 50, 0
    assert df2_b * 1000 // df1_b == 1000
    assert df2_u * 1000 // df1_u == 0


def _pgm_bytes(px):
    h, w = px.shape
    return (f"P5 {w} {h} 255\n".encode()
            + px.astype(np.uint8).tobytes())


def test_image_centroid_exact_on_constructed():
    from log_analysis_ai_ray.stages.multimodal import CentroidStage
    # all mass in one pixel at (x=3, y=1) of a 4x5 image
    px = np.zeros((4, 5), dtype=np.uint8)
    px[1, 3] = 200
    batch = pa.table({
        "media_id": pa.array([7], pa.int64()),
        "kind": pa.array(["image"]),
        "payload": pa.array([_pgm_bytes(px)], pa.binary())})
    t = CentroidStage()(batch)
    assert t.column("centroid_x_milli")[0].as_py() == 3000
    assert t.column("centroid_y_milli")[0].as_py() == 1000
    # exactly one pixel above the (floored) mean
    assert t.column("above_mean_pm")[0].as_py() == 1000 // 20


def test_reciprocity_counts():
    pairs = {("a", "b"), ("b", "a"), ("a", "c")}
    mutual = sum(1 for a, b in pairs if (b, a) in pairs)
    assert mutual == 2          # both directions of the a<->b pair
    assert mutual * 1000 // len(pairs) == 666


def test_transport_plan_mass_conserves_and_cost_equals_w1():
    # two tiny histograms: plan marginals must match, cost == W1 num
    vx, cx = np.array([1, 5]), np.array([3, 1])
    vy, cy = np.array([2, 9]), np.array([2, 2])
    nx, ny = int(cx.sum()), int(cy.sum())
    cumx, cumy = np.cumsum(cx), np.cumsum(cy)
    cells = []
    cost = 0
    for i in range(len(vx)):
        lo_x = int(cumx[i - 1]) * ny if i else 0
        hi_x = int(cumx[i]) * ny
        for j in range(len(vy)):
            lo_y = int(cumy[j - 1]) * nx if j else 0
            hi_y = int(cumy[j]) * nx
            mass = min(hi_x, hi_y) - max(lo_x, lo_y)
            if mass > 0:
                cells.append((i, j, mass))
                cost += mass * abs(int(vx[i]) - int(vy[j]))
    # marginals: sum of mass per row i == cx[i]·ny, per col j == cy[j]·nx
    for i in range(len(vx)):
        assert sum(m for a, _b, m in cells if a == i) == cx[i] * ny
    for j in range(len(vy)):
        assert sum(m for _a, b, m in cells if b == j) == cy[j] * nx
    # W1 numerator from the CDF sweep must equal the plan cost
    support = np.unique(np.concatenate([vx, vy]))
    gx = np.zeros(len(support), dtype=np.int64)
    gy = np.zeros(len(support), dtype=np.int64)
    gx[np.searchsorted(support, vx)] = cx
    gy[np.searchsorted(support, vy)] = cy
    cx2, cy2 = np.cumsum(gx), np.cumsum(gy)
    w1num = sum(abs(int(cx2[i]) * ny - int(cy2[i]) * nx)
                * int(support[i + 1] - support[i])
                for i in range(len(support) - 1))
    assert cost == w1num


def test_stationary_distribution_fixed_point():
    # two-state chain with known stationary [1/3, 2/3]
    p = np.array([[0.2, 0.8], [0.4, 0.6]])
    v = np.full(2, 0.5)
    for _ in range(50):
        v = v @ p
        v = v / v.sum()
    assert abs(v[0] - 1 / 3) < 1e-9
    assert abs(v[1] - 2 / 3) < 1e-9


def test_bowley_symmetric_zero_right_skew_positive():
    # symmetric quartiles -> 0; right tail pulls Q3 out -> positive
    q1, q2, q3 = 10, 20, 30
    assert (q3 + q1 - 2 * q2) * 1_000_000 // (q3 - q1) == 0
    q1, q2, q3 = 10, 15, 40
    assert (q3 + q1 - 2 * q2) * 1_000_000 // (q3 - q1) > 0


def test_logloss_gap_is_kl():
    import math
    # ll - entropy == KL(p2 || p1) by algebra; identical dists -> 0
    n1 = {"a": 51, "b": 51}          # +1 smoothing applied
    n2 = {"a": 50, "b": 50}
    t1, t2 = sum(n1.values()), sum(n2.values())
    ll = sum(-n2[k] * math.log(n1[k] / t1) for k in sorted(n1)) / t2
    ent = sum(-n2[k] * math.log(n2[k] / t2)
              for k in sorted(n2) if n2[k]) / t2
    assert abs(ll - ent) < 1e-12
    # shifted dist -> positive KL
    n1 = {"a": 91, "b": 11}
    ll = sum(-n2[k] * math.log(n1[k] / sum(n1.values()))
             for k in sorted(n1)) / t2
    assert ll - ent > 0.1


def test_record_count_expected_harmonic():
    from fractions import Fraction
    # strictly increasing -> every day is a record; decreasing -> 1
    inc = np.arange(10)
    rm = np.maximum.accumulate(inc)
    assert int(1 + (inc[1:] > rm[:-1]).sum()) == 10
    dec = -np.arange(10)
    rm = np.maximum.accumulate(dec)
    assert int(1 + (dec[1:] > rm[:-1]).sum()) == 1
    # harmonic micro for n=4: 1+1/2+1/3+1/4 = 25/12
    h = sum(Fraction(1, k) for k in range(1, 5))
    assert int(h * 1_000_000 + Fraction(1, 2)) == 2083333


def test_gumbel_mom_recovers_parameters():
    import math
    rng = np.random.default_rng(59)
    mu_true, beta_true = 500.0, 40.0
    x = mu_true - beta_true * np.log(-np.log(
        rng.uniform(1e-9, 1 - 1e-9, 20000)))
    mean, var = x.mean(), x.var()
    beta = math.sqrt(6.0 * var) / math.pi
    mu = mean - 0.5772156649015329 * beta
    assert abs(beta - beta_true) < 2.0
    assert abs(mu - mu_true) < 2.0


def test_heaps_beta_for_powerlaw_growth():
    import math
    # V = 3*N^0.5 exactly at checkpoints -> slope recovers 0.5
    pts = [(n, 3 * n ** 0.5) for n in (10, 100, 1000, 10000)]
    xs = [math.log(n) for n, _ in pts]
    ys = [math.log(v) for _, v in pts]
    k = len(pts)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(v * v for v in xs)
    sxy = sum(a * b for a, b in zip(xs, ys))
    beta = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    assert abs(beta - 0.5) < 1e-9


def test_cohens_d_unit_gap_unit_sd():
    import math
    # two groups, means 0 and 1, both with Σ(y−μ)² = n (unit
    # population variance): pooled sd ≈ 1, so d ≈ 1
    n = 1000
    ss1 = ss2 = float(n)
    sp = math.sqrt((ss1 + ss2) / (2 * n - 2))
    d = (1.0 - 0.0) / sp
    assert abs(d - 1.0) < 0.002  # √((2n)/(2n−2)) ≈ 1.0005


def test_wilcoxon_symmetric_diffs_z_zero():
    import math
    # perfectly antisymmetric diffs: W+ equals its null mean -> z == 0
    d = np.array([5, -5, 3, -3, 1, -1], dtype=np.int64)
    ad = np.abs(d)
    vu, vi = np.unique(ad, return_inverse=True)
    cnt = np.bincount(vi).astype(np.int64)
    cumb = np.concatenate(([0], np.cumsum(cnt)[:-1]))
    r2 = 2 * cumb + cnt + 1
    n = len(d)
    w2 = int(r2[vi][d > 0].sum())
    tie = int(sum(int(t) ** 3 - int(t) for t in cnt))
    sigma = math.sqrt((n * (n + 1) * (2 * n + 1) - tie / 2.0) / 24.0)
    z = (w2 / 2.0 - n * (n + 1) / 4.0) / sigma
    assert abs(z) < 1e-12
    # all positive diffs -> maximal W+, strongly positive z
    d = np.array([1, 2, 3, 4, 5, 6], dtype=np.int64)
    ad = np.abs(d)
    vu, vi = np.unique(ad, return_inverse=True)
    cnt = np.bincount(vi).astype(np.int64)
    cumb = np.concatenate(([0], np.cumsum(cnt)[:-1]))
    r2 = 2 * cumb + cnt + 1
    w2 = int(r2[vi][d > 0].sum())
    assert w2 == 2 * n * (n + 1) // 2


def test_friedman_identical_rankings_maximal():
    # same ordering every day -> chi2 hits its max n(k-1) (no ties)
    k, n = 4, 30
    row_rank2 = np.array([2, 4, 6, 8])  # doubled ranks 1..4
    r2_sums = row_rank2 * n
    s4 = int((r2_sums.astype(object) ** 2).sum())
    chi2 = 3.0 * s4 / (n * k * (k + 1)) - 3.0 * n * (k + 1)
    assert abs(chi2 - n * (k - 1)) < 1e-9
    # perfectly rotating rankings -> equal rank sums -> chi2 == 0
    r2_equal = np.full(k, int(row_rank2.mean() * n))
    s4 = int((r2_equal.astype(object) ** 2).sum())
    chi2 = 3.0 * s4 / (n * k * (k + 1)) - 3.0 * n * (k + 1)
    assert abs(chi2) < 1e-9


def test_cramers_v_bounds():
    import math
    # perfect association in a 2x2: chi2 == n -> V == 1
    n, chi2 = 100, 100.0
    assert abs(math.sqrt(chi2 / (n * 1)) - 1.0) < 1e-12
    # independence: chi2 == 0 -> V == 0
    assert math.sqrt(0.0 / (n * 1)) == 0.0


def test_brown_forsythe_equal_spread_zero_unequal_large():
    def bf_f(groups):
        ns, ss, qs = [], [], []
        for g in groups:
            g = np.sort(np.asarray(g, dtype=np.int64))
            med = int(g[(len(g) + 1) // 2 - 1])
            z = np.abs(g - med).astype(object)
            ns.append(len(g))
            ss.append(int(z.sum()))
            qs.append(int((z ** 2).sum()))
        n_tot, s_tot, q_tot = sum(ns), sum(ss), sum(qs)
        k = len(groups)
        sb = sum(float(s * s) / n for s, n in zip(ss, ns))
        ssb = sb - float(s_tot) * s_tot / n_tot
        ssw = float(q_tot) - sb
        return (ssb / (k - 1)) / (ssw / (n_tot - k))
    rng = np.random.default_rng(61)
    a = rng.integers(0, 100, 500)
    b = rng.integers(500, 600, 500)       # same spread, shifted mean
    assert bf_f([a, b]) < 5               # location shift invisible
    c = rng.integers(0, 1000, 500)        # 10x the spread
    assert bf_f([a, c]) > 100

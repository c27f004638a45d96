"""Kernel-level semantics for the round-3c additions: mergeable OLS /
correlation sufficient statistics, MAD-from-counts, CUSUM peak, PMI
closure, and the snapshot-diff classifier. (Oracle parity for the full
queries is covered by the driver / tools/selfcheck.py.)"""

import math

import numpy as np
import pyarrow as pa

from log_analysis_ai_ray.pipelines.queries import (
    _diff_kbucket, _quantile_disc_from_counts,
)


def test_ols_sufficient_statistics_merge():
    # slope from merged partial sums == slope from the full arrays,
    # and matches numpy's polyfit closed form.
    rng = np.random.default_rng(7)
    x = rng.integers(0, 60, size=500).astype(np.int64)
    y = (3 * x + rng.integers(-10, 10, size=500)).astype(np.int64)
    halves = [(x[:250], y[:250]), (x[250:], y[250:])]
    n = sx = sy = sxx = sxy = 0
    for xs, ys in halves:  # per-block int64 partials, bigint close
        n += len(xs)
        sx += int(xs.sum())
        sy += int(ys.sum())
        sxx += int((xs * xs).sum())
        sxy += int((xs * ys).sum())
    slope = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
    ref = np.polyfit(x.astype(float), y.astype(float), 1)[0]
    assert abs(slope - ref) < 1e-9
    assert 2.9 < slope < 3.1


def test_corr_sufficient_statistics_vs_numpy():
    rng = np.random.default_rng(11)
    x = rng.integers(1, 50, size=400).astype(np.int64)
    y = (x * 100 + rng.integers(-500, 500, size=400)).astype(np.int64)
    n = len(x)
    sx, sy = int(x.sum()), int(y.sum())
    sxx, syy = int((x * x).sum()), int((y * y).sum())
    sxy = int((x * y).sum())
    num = n * sxy - sx * sy
    corr = float(num) / math.sqrt(float(n * sxx - sx * sx)
                                  * float(n * syy - sy * sy))
    assert abs(corr - np.corrcoef(x, y)[0, 1]) < 1e-12


def test_mad_from_counts_matches_bruteforce():
    vals = np.array([1, 2, 3, 10, 50], dtype=np.int64)
    cnts = np.array([5, 3, 2, 1, 1], dtype=np.int64)
    med = _quantile_disc_from_counts(vals, cnts, 0.5)
    full = np.repeat(vals, cnts)
    # quantile_disc(0.5): value at 0-based rank ceil(n*0.5)-1
    assert med == int(np.sort(full)[math.ceil(len(full) * 0.5) - 1])
    dev = np.abs(vals - med)
    order = np.argsort(dev, kind="stable")
    mad = _quantile_disc_from_counts(dev[order], cnts[order], 0.5)
    full_dev = np.sort(np.abs(full - med))
    assert mad == int(full_dev[math.ceil(len(full_dev) * 0.5) - 1])


def test_cusum_peak_detects_level_shift():
    # stationary series -> small peak; mid-series shift -> ~n/2*delta
    flat = np.full(40, 10.0)
    assert np.max(np.abs(np.cumsum(flat - flat.mean()))) < 1e-9
    shifted = np.concatenate([np.full(20, 10.0), np.full(20, 20.0)])
    peak = np.max(np.abs(np.cumsum(shifted - shifted.mean())))
    assert abs(peak - 20 * 5.0) < 1e-9


def test_pmi_closure_orders_collocations_first():
    # "new york" always adjacent; "the the" independent — PMI must
    # rank the true collocation far above the independent pair.
    n_tok, n_pair = 1000, 900
    c_ny, c_new, c_york = 50, 50, 50
    c_thethe, c_the = 25, 500
    pmi_ny = math.log(float(c_ny * n_tok * n_tok)
                      / float(n_pair * c_new * c_york))
    pmi_the = math.log(float(c_thethe * n_tok * n_tok)
                       / float(n_pair * c_the * c_the))
    assert pmi_ny > pmi_the + 2


def test_diff_kbucket_deterministic_and_spread():
    ids = np.arange(10_000, dtype=np.int64)
    k = _diff_kbucket(ids)
    assert k.min() >= 0 and k.max() <= 99
    assert np.array_equal(k, _diff_kbucket(ids))  # pure function
    # each 3-bucket band carries roughly 3% of ids
    frac_added = (k < 3).mean()
    assert 0.02 < frac_added < 0.04


def test_range_sort_partition_offsets_exact():
    # the range-cut + offset arithmetic of events_range_sorted_sample:
    # global ranks reassembled from per-range local sorts must equal a
    # full sort, including rows equal to a range-bound value.
    rng = np.random.default_rng(3)
    cents = rng.integers(0, 50, size=2000).astype(np.int64)  # heavy ties
    ids = np.arange(2000, dtype=np.int64)
    vals, cnts = np.unique(cents, return_counts=True)
    order = np.argsort(-vals)
    vals, cnts = vals[order], cnts[order]
    cum = np.cumsum(cnts)
    total = int(cum[-1])
    npart = 7
    targets = (np.arange(1, npart) * total) // npart
    cut = np.searchsorted(cum, targets, side="left")
    bounds = vals[cut]
    start = np.concatenate([[0], cum[cut]])
    pid = np.searchsorted(-bounds, -cents, side="left")
    got = np.empty(total, dtype=np.int64)
    for p in range(npart):
        m = pid == p
        e, c = ids[m], cents[m]
        o = np.lexsort((e, -c))
        got[e[o]] = np.arange(m.sum()) + start[p] + 1
    full = np.lexsort((ids, -cents))
    want = np.empty(total, dtype=np.int64)
    want[ids[full]] = np.arange(total) + 1
    assert np.array_equal(got, want)


def test_bpe_train_matches_bruteforce():
    from log_analysis_ai_ray.pipelines.queries import _bpe_train

    word_freq = {"lower": 2, "lowest": 1, "newer": 3, "wider": 1,
                 "new": 2, "a": 5}

    # independent reference: re-tokenize the expanded corpus each round
    def ref(wf, k):
        corpus = []
        for w, f in wf.items():
            corpus.extend([list(w)] * f)
        merges = []
        for _ in range(k):
            counts = {}
            for syms in corpus:
                for i in range(len(syms) - 1):
                    counts[(syms[i], syms[i + 1])] = \
                        counts.get((syms[i], syms[i + 1]), 0) + 1
            if not counts:
                break
            (l, r), c = min(counts.items(),
                            key=lambda kv: (-kv[1], kv[0]))
            merges.append((l, r, c))
            nxt = []
            for syms in corpus:
                out, i = [], 0
                while i < len(syms):
                    if (i + 1 < len(syms) and syms[i] == l
                            and syms[i + 1] == r):
                        out.append(l + r)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                nxt.append(out)
            corpus = nxt
        return merges

    assert _bpe_train(dict(word_freq), 6) == ref(word_freq, 6)
    # merged symbols must keep merging into longer units
    merges = _bpe_train({"aaaa": 4}, 2)
    assert merges[0] == ("a", "a", 12)   # 3 adjacent pairs x freq 4
    assert merges[1][0] == "aa"


def test_last_touch_forward_fill_kernel():
    # mirrors q_purchase_attribution's per-partition scan on a case
    # with: same-instant click (ignored), cross-user leak risk,
    # window expiry, and a tie resolved to the larger click id.
    rows = [
        # (user, ts, event_id, is_click)
        (1, 100, 10, 1),
        (1, 100, 11, 1),   # tie: larger id must win
        (1, 200, 12, 0),   # purchase -> click 11
        (2, 150, 20, 0),   # purchase, user 2 has no click -> -1
        (2, 300, 21, 1),
        (2, 300, 22, 0),   # same-instant click must NOT match -> -1
        (2, 400, 23, 0),   # -> click 21
    ]
    import numpy as np
    u = np.array([r[0] for r in rows], dtype=np.int64)
    ts = np.array([r[1] for r in rows], dtype=np.int64)
    e = np.array([r[2] for r in rows], dtype=np.int64)
    ic = np.array([r[3] for r in rows], dtype=np.int64)
    order = np.lexsort((e, ic, ts, u))
    u, ts, e, ic = u[order], ts[order], e[order], ic[order]
    n = len(u)
    idx = np.arange(n, dtype=np.int64)
    carry = np.where(ic == 1, idx, -1)
    ff = np.maximum.accumulate(carry)
    seg_first = np.concatenate([[0],
                                np.flatnonzero(u[1:] != u[:-1]) + 1])
    start = np.zeros(n, dtype=bool)
    start[seg_first] = True
    seg_id = np.cumsum(start) - 1
    has = ff >= 0
    same = has.copy()
    same[has] = seg_id[ff[has]] == seg_id[has]
    win = has & (ts - np.where(has, ts[np.maximum(ff, 0)], 0) <= 10_000)
    attr = np.where(same & win, e[np.maximum(ff, 0)], -1)
    purch = ic == 0
    got = dict(zip(e[purch].tolist(), attr[purch].tolist()))
    assert got == {12: 11, 20: -1, 22: -1, 23: 21}


def test_ed_le_1_verifier_and_fastss_recall():
    from log_analysis_ai_ray.pipelines.queries import (_del_variants,
                                                       _ed_le_1)

    assert _ed_le_1("abc", "abc")
    assert _ed_le_1("abc", "abd")       # substitution
    assert _ed_le_1("abc", "abcd")      # insertion at end
    assert _ed_le_1("abc", "xabc")      # insertion at front
    assert _ed_le_1("abc", "ab")        # deletion
    assert not _ed_le_1("abc", "adc1")  # sub + insert = 2
    assert not _ed_le_1("abc", "cba")
    assert not _ed_le_1("abc", "abcde")
    # FastSS completeness: any pair at ed<=1 shares a member of
    # {s} ∪ deletions(s) on both sides
    import itertools
    words = ["cat", "cut", "cast", "at", "dog", "cats"]
    for a, b in itertools.combinations(words, 2):
        if _ed_le_1(a, b):
            va = set([a] + _del_variants(a))
            vb = set([b] + _del_variants(b))
            assert va & vb, (a, b)


def test_compression_ratio_orders_repetitive_above_random():
    import zlib

    rep = ("the same line again and again\n" * 50).encode()
    rng = np.random.default_rng(5)
    rand = bytes(rng.integers(33, 126, size=len(rep),
                              dtype=np.uint8).tolist())
    r_rep = len(rep) * 1000 // len(zlib.compress(rep, 6))
    r_rand = len(rand) * 1000 // len(zlib.compress(rand, 6))
    assert r_rep > 5 * r_rand          # repetitive ≫ incompressible
    assert r_rand < 1300               # random barely compresses


def test_bpe_encode_matches_trainer_state():
    """Applying the learned merges must reproduce the trainer's final
    symbol state (hand-computed golden) and respect rank order /
    left-to-right non-overlap."""
    from log_analysis_ai_ray.pipelines.queries import (_bpe_encode_word,
                                                       _bpe_train)

    wf = {"abab": 2, "ab": 3}
    merges = _bpe_train(wf, 2)
    assert [(m[0], m[1]) for m in merges] == [("a", "b"), ("ab", "ab")]
    assert merges[0][2] == 7 and merges[1][2] == 2
    assert _bpe_encode_word("abab", merges) == ["abab"]
    assert _bpe_encode_word("ab", merges) == ["ab"]
    assert _bpe_encode_word("aba", merges) == ["ab", "a"]
    assert _bpe_encode_word("bab", merges) == ["b", "ab"]


def test_bpe_token_counts_conserves_mass(ray_session):
    """Token counts weighted by length must equal the corpus's total
    non-space characters (merging never loses characters)."""
    from log_analysis_ai_ray.pipelines.queries import q_bpe_token_counts

    sf_dir = "/root/testdata/sf0.001"
    out = q_bpe_token_counts(sf_dir)
    import duckdb

    total_chars = duckdb.sql(
        f"SELECT sum(length(replace(text, ' ', ''))) FROM "
        f"read_parquet('{sf_dir}/documents.parquet')").fetchone()[0]
    got = sum(len(t) * n for t, n in
              zip(out.column("token").to_pylist(),
                  out.column("n").to_pylist()))
    assert got == total_chars

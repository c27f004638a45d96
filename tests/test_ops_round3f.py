"""Kernel-level semantics for the round-3f additions: largest-remainder
proration, histogram AUC with tie correction, disjunctive branch
predicates. (Oracle parity for the full queries is covered by the
driver / tools/selfcheck.py.)"""

import numpy as np


def _prorate_bruteforce(T, weights, linenos):
    """Reference largest-remainder allocation for ONE order."""
    W = sum(weights)
    base = [T * w // W for w in weights]
    rem = [(T * w) % W for w in weights]
    leftover = T - sum(base)
    order = sorted(range(len(weights)), key=lambda i: (-rem[i], linenos[i]))
    alloc = list(base)
    for i in order[:leftover]:
        alloc[i] += 1
    return alloc


def _prorate_segmented(ok, ln, w, t_by_order):
    """Mirror of q_order_proration's segment arithmetic over a batch of
    orders (ok = per-line orderkey, t_by_order = key -> total)."""
    ok = np.asarray(ok, dtype=np.int64)
    ln = np.asarray(ln, dtype=np.int64)
    w = np.asarray(w, dtype=np.int64)
    t_ord = np.array([t_by_order[k] for k in ok], dtype=np.int64)
    order = np.lexsort((ln, ok))
    ok, ln, w, t_ord = ok[order], ln[order], w[order], t_ord[order]
    uk, seg_start = np.unique(ok, return_index=True)
    W = np.add.reduceat(w, seg_start)
    seg_id = np.searchsorted(uk, ok)
    prod = t_ord * w
    base = prod // W[seg_id]
    rem = prod % W[seg_id]
    leftover = t_ord[seg_start] - np.add.reduceat(base, seg_start)
    rorder = np.lexsort((ln, -rem, ok))
    rpos = np.empty(len(ok), dtype=np.int64)
    seg_of_r = seg_id[rorder]
    first_at = np.r_[0, np.flatnonzero(np.diff(seg_of_r)) + 1]
    offsets = np.arange(len(ok), dtype=np.int64)
    starts = np.repeat(offsets[first_at],
                       np.diff(np.r_[first_at, len(ok)]))
    rpos[rorder] = offsets - starts
    alloc = base + (rpos < leftover[seg_id])
    return {(int(k), int(l)): int(a) for k, l, a in zip(ok, ln, alloc)}


def test_proration_matches_bruteforce_multi_order():
    rng = np.random.default_rng(11)
    t_by_order, ok, ln, w = {}, [], [], []
    for k in range(1, 40):
        n = int(rng.integers(1, 8))
        weights = rng.integers(1, 10_000, n).tolist()
        T = int(rng.integers(1, 5_000_000))
        t_by_order[k] = T
        linenos = list(range(1, n + 1))
        want = _prorate_bruteforce(T, weights, linenos)
        for i in range(n):
            ok.append(k)
            ln.append(linenos[i])
            w.append(weights[i])
        t_by_order[(k, "want")] = want
    got = _prorate_segmented(ok, ln, w,
                             {k: v for k, v in t_by_order.items()
                              if isinstance(k, int)})
    for k in range(1, 40):
        want = t_by_order[(k, "want")]
        for i, a in enumerate(want):
            assert got[(k, i + 1)] == a, (k, i)


def test_proration_sums_exactly_to_total():
    rng = np.random.default_rng(5)
    for _ in range(50):
        n = int(rng.integers(1, 9))
        weights = rng.integers(1, 1_000, n).tolist()
        T = int(rng.integers(0, 100_000))
        alloc = _prorate_bruteforce(T, weights, list(range(n)))
        assert sum(alloc) == T
        # leftover strictly less than n lines
        base_sum = sum(T * w // sum(weights) for w in weights)
        assert 0 <= T - base_sum < max(n, 1)


def test_proration_remainder_ties_break_by_linenumber():
    # equal weights, T not divisible: first lines get the extra cents
    alloc = _prorate_bruteforce(10, [1, 1, 1], [1, 2, 3])
    assert alloc == [4, 3, 3]


def _auc_bruteforce(scores, labels):
    """Pairwise Mann-Whitney AUC with 0.5 tie credit."""
    pos = [s for s, y in zip(scores, labels) if y == 1]
    neg = [s for s, y in zip(scores, labels) if y == 0]
    num = 0.0
    for p in pos:
        for n in neg:
            num += 1.0 if p > n else (0.5 if p == n else 0.0)
    return num / (len(pos) * len(neg))


def _auc_histogram(scores, labels):
    """Mirror of q_auc_doc_length's histogram closure."""
    scores = np.asarray(scores, dtype=np.int64)
    labels = np.asarray(labels, dtype=np.int64)
    uniq = np.unique(scores)
    p = np.array([(labels[scores == s] == 1).sum() for s in uniq],
                 dtype=np.int64)
    ng = np.array([(labels[scores == s] == 0).sum() for s in uniq],
                  dtype=np.int64)
    P, N = int(p.sum()), int(ng.sum())
    cnb = np.cumsum(ng) - ng
    num2 = int((p * (2 * cnb + ng)).sum())
    return num2 / (2.0 * P * N)


def test_histogram_auc_matches_pairwise_with_ties():
    rng = np.random.default_rng(3)
    scores = rng.integers(0, 15, 120).tolist()   # heavy ties
    labels = rng.integers(0, 2, 120).tolist()
    if sum(labels) in (0, len(labels)):
        labels[0] = 1 - labels[0]
    want = _auc_bruteforce(scores, labels)
    got = _auc_histogram(scores, labels)
    assert abs(want - got) < 1e-12


def test_histogram_auc_perfect_and_inverted():
    assert _auc_histogram([1, 2, 3, 10, 11, 12],
                          [0, 0, 0, 1, 1, 1]) == 1.0
    assert _auc_histogram([10, 11, 12, 1, 2, 3],
                          [0, 0, 0, 1, 1, 1]) == 0.0
    # all-tied scores: AUC is exactly 1/2
    assert _auc_histogram([5, 5, 5, 5], [0, 1, 0, 1]) == 0.5

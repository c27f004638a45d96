"""Property-based invariants (hypothesis) for the session-8 kernels:
PAVA isotonic projection, Qn pairwise order statistic, Wasserstein-1,
Page-CUSUM prefix identity, largest-remainder allocation."""

from fractions import Fraction

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from log_analysis_ai_ray.pipelines.queries_ext import (_pava_fractions,
                                                       _trunc_div)

ints = st.integers(min_value=-1000, max_value=1000)


@settings(max_examples=60, deadline=None)
@given(st.lists(ints, min_size=1, max_size=30))
def test_pava_monotone_mass_preserving_idempotent(y):
    fit = _pava_fractions(y)
    assert all(a <= b for a, b in zip(fit, fit[1:]))
    assert sum(fit) == sum(Fraction(v) for v in y)
    # projection: applying PAVA to its own output is the identity
    refit = _pava_fractions(fit)
    assert refit == fit


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=30), min_size=3,
                max_size=60))
def test_qn_histogram_equals_bruteforce(xs):
    xs = np.asarray(xs, dtype=np.int64)
    vu, cc = np.unique(xs, return_counts=True)
    lut = dict(zip(vu.tolist(), cc.tolist()))
    n = len(xs)
    h = n // 2 + 1
    k = h * (h - 1) // 2
    cum, qn = 0, None
    for e in range(0, int(vu.max() - vu.min()) + 1):
        if e == 0:
            cum += sum(c * (c - 1) // 2 for c in lut.values())
        else:
            cum += sum(c * lut.get(v + e, 0) for v, c in lut.items())
        if cum >= k:
            qn = e
            break
    diffs = np.abs(xs[:, None] - xs[None, :])[np.triu_indices(n, 1)]
    assert qn == int(np.sort(diffs)[k - 1])


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=50), min_size=2,
                max_size=50),
       st.lists(st.integers(min_value=0, max_value=50), min_size=2,
                max_size=50))
def test_wasserstein_metric_properties(xs, ys):
    def w1(a, b):
        a, b = np.sort(np.asarray(a)), np.sort(np.asarray(b))
        support = np.unique(np.concatenate([a, b]))
        ca = np.searchsorted(a, support, side="right")
        cb = np.searchsorted(b, support, side="right")
        num = sum(abs(int(ca[i]) * len(b) - int(cb[i]) * len(a))
                  * int(support[i + 1] - support[i])
                  for i in range(len(support) - 1))
        return Fraction(num, len(a) * len(b))
    # identity, symmetry, non-negativity
    assert w1(xs, xs) == 0
    assert w1(xs, ys) == w1(ys, xs) >= 0


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=-100, max_value=100),
                min_size=1, max_size=200))
def test_page_cusum_identity_random(xs):
    s_ref, s = [], 0
    for v in xs:
        s = max(0, s + v)
        s_ref.append(s)
    p = np.cumsum(np.asarray(xs, dtype=np.int64))
    s_id = p - np.minimum(np.minimum.accumulate(p), 0)
    assert s_id.tolist() == s_ref


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=0, max_value=10**6))
def test_allocation_exact_partition(n):
    splits = ((80,), (10,), (10,))
    floors = [(n * w[0] // 100, (n * w[0]) % 100) for w in splits]
    left = n - sum(f[0] for f in floors)
    by_rem = sorted(range(3), key=lambda i: (-floors[i][1], i))
    alloc = [f[0] for f in floors]
    for i in by_rem[:left]:
        alloc[i] += 1
    assert sum(alloc) == n
    assert all(a >= 0 for a in alloc)


@settings(max_examples=80, deadline=None)
@given(st.integers(min_value=-10**9, max_value=10**9),
       st.integers(min_value=1, max_value=10**6))
def test_trunc_div_sign_semantics(num, den):
    q = _trunc_div(num, den)
    # |q| == |num| // |den| and sign follows the quotient
    assert abs(q) == abs(num) // den
    assert q * den <= abs(num) if num >= 0 else True
    # DuckDB semantics: int(num / den) with truncation toward zero
    assert q == int(num / den) or abs(num) >= 2**52

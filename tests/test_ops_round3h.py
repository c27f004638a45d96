"""Kernel-level semantics for the round-3h additions: histogram
Spearman with exact tie correction, grid interpolation edges, PSI
terms. (Oracle parity for the full queries is covered by the driver /
tools/selfcheck.py.)"""

import numpy as np


def _spearman_bruteforce(x, y):
    """Pearson on average ranks (the tie-corrected Spearman)."""
    def avg_ranks(v):
        v = np.asarray(v, dtype=np.float64)
        order = np.argsort(v, kind="stable")
        r = np.empty(len(v))
        sv = v[order]
        i = 0
        pos = 1
        while i < len(sv):
            j = i
            while j < len(sv) and sv[j] == sv[i]:
                j += 1
            rank = (pos + (pos + (j - i) - 1)) / 2.0
            for k in range(i, j):
                r[order[k]] = rank
            pos += j - i
            i = j
        return r

    rx, ry = avg_ranks(x), avg_ranks(y)
    rx -= rx.mean()
    ry -= ry.mean()
    return float((rx * ry).sum()
                 / np.sqrt((rx * rx).sum() * (ry * ry).sum()))


def _spearman_histogram(x, y):
    """Mirror of q_spearman_qty_discount's joint-histogram closure."""
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    # joint histogram cells
    cells = {}
    for a, b in zip(x, y):
        cells[(int(a), int(b))] = cells.get((int(a), int(b)), 0) + 1
    q = np.array([k[0] for k in cells], dtype=np.int64)
    d = np.array([k[1] for k in cells], dtype=np.int64)
    c = np.array(list(cells.values()), dtype=np.int64)

    def r2_of(vals):
        u, inv = np.unique(vals, return_inverse=True)
        cnt = np.zeros(len(u), dtype=np.int64)
        np.add.at(cnt, inv, c)
        cb = np.cumsum(cnt) - cnt
        return (2 * cb + cnt + 1)[inv]

    xr, yr = r2_of(q), r2_of(d)
    n = int(c.sum())
    cl = [int(v) for v in c]
    xl = [int(v) for v in xr]
    yl = [int(v) for v in yr]
    sx = sum(w * a for w, a in zip(cl, xl))
    sy = sum(w * b for w, b in zip(cl, yl))
    sxx = sum(w * a * a for w, a in zip(cl, xl))
    syy = sum(w * b * b for w, b in zip(cl, yl))
    sxy = sum(w * a * b for w, a, b in zip(cl, xl, yl))
    num = n * sxy - sx * sy
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    import math
    return float(num) / (math.sqrt(float(vx)) * math.sqrt(float(vy)))


def test_histogram_spearman_matches_rank_pearson_with_ties():
    rng = np.random.default_rng(13)
    x = rng.integers(1, 8, 200)   # heavy ties
    y = (x + rng.integers(0, 5, 200)) % 9
    want = _spearman_bruteforce(x, y)
    got = _spearman_histogram(x, y)
    assert abs(want - got) < 1e-10


def test_histogram_spearman_perfect_monotone():
    x = np.arange(50)
    assert abs(_spearman_histogram(x, x * 3 + 1) - 1.0) < 1e-12
    assert abs(_spearman_histogram(x, -x) + 1.0) < 1e-12


def _interp_grid(ho, vo, grid):
    """Mirror of q_hourly_interpolated's searchsorted closure."""
    ho = np.asarray(ho, dtype=np.int64)
    vo = np.asarray(vo, dtype=np.int64)
    grid = np.asarray(grid, dtype=np.int64)
    pi = np.searchsorted(ho, grid, side="right") - 1
    ni = np.searchsorted(ho, grid, side="left")
    pi_c = np.clip(pi, 0, len(ho) - 1)
    ni_c = np.clip(ni, 0, len(ho) - 1)
    pv, ph = vo[pi_c], ho[pi_c]
    nv, nh = vo[ni_c], ho[ni_c]
    observed = (ni < len(ho)) & (ho[ni_c] == grid)
    gap = np.maximum(nh - ph, 1)
    interp = (pv * (nh - grid) + nv * (grid - ph)) // gap
    interp = np.where(observed, nv, interp)
    interp = np.where(pi < 0, nv, interp)
    interp = np.where(ni >= len(ho), pv, interp)
    return interp


def test_interpolation_exact_midpoints_and_edges():
    ho = [10, 14, 20]
    vo = [100, 300, 0]
    grid = np.arange(8, 23)
    got = _interp_grid(ho, vo, grid)
    # before first -> first value; after last -> last value
    assert got[0] == 100 and got[1] == 100      # h=8,9
    assert got[-1] == 0 and got[-2] == 0        # h=21,22
    # observed points exact
    assert got[2] == 100 and got[6] == 300 and got[12] == 0
    # linear between 10..14: 100 + 50*k
    assert list(got[3:6]) == [150, 200, 250]
    # decreasing segment 14..20: floor((300*(20-h) + 0*(h-14))/6)
    assert got[7] == (300 * 5) // 6
    # floor semantics: non-negative weighted average, no negative
    # numerator anywhere
    assert (got >= 0).all()


def test_psi_identical_halves_is_zero():
    c = np.array([5, 10, 0, 3, 7, 0, 0, 2, 1, 4], dtype=np.int64)
    n = int(c.sum())
    p = (c + 1.0) / (n + 10)
    terms = np.round((p - p) * np.log(p / p) * 1e6).astype(np.int64)
    assert terms.sum() == 0

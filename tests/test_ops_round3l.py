"""Kernel-level semantics for the round-3l hypothesis-test batch:
Welch t-test, one-way ANOVA F, Wald–Wolfowitz runs test — each checked
against a direct flat-array computation (no scipy in the container, so
the references are the textbook closed forms)."""

import math

import numpy as np


def _welch_from_sums(n1, s1, q1, n2, s2, q2):
    m1, m2 = s1 / n1, s2 / n2
    v1 = float(n1 * q1 - s1 * s1) / float(n1 * (n1 - 1))
    v2 = float(n2 * q2 - s2 * s2) / float(n2 * (n2 - 1))
    se1, se2 = v1 / n1, v2 / n2
    t = (m1 - m2) / math.sqrt(se1 + se2)
    df = (se1 + se2) ** 2 / (se1 ** 2 / (n1 - 1) + se2 ** 2 / (n2 - 1))
    return t, df


def test_welch_matches_flat_formula():
    rng = np.random.default_rng(7)
    a = rng.integers(0, 1000, 400).astype(np.int64)
    b = rng.integers(100, 900, 300).astype(np.int64)
    t, df = _welch_from_sums(len(a), int(a.sum()), int((a * a).sum()),
                             len(b), int(b.sum()), int((b * b).sum()))
    # flat reference: ddof=1 variances on the raw arrays
    v1, v2 = a.var(ddof=1), b.var(ddof=1)
    se = v1 / len(a) + v2 / len(b)
    t_ref = (a.mean() - b.mean()) / math.sqrt(se)
    df_ref = se ** 2 / ((v1 / len(a)) ** 2 / (len(a) - 1)
                        + (v2 / len(b)) ** 2 / (len(b) - 1))
    assert abs(t - t_ref) < 1e-9
    assert abs(df - df_ref) < 1e-6


def test_anova_f_two_equal_groups_is_zero():
    # identical group means → SSB == 0 → F == 0
    ns = [10, 10]
    ss = [100, 100]
    n_tot, s_tot = sum(ns), sum(ss)
    sb = sum(float(s * s) / n for s, n in zip(ss, ns))
    ssb = sb - float(s_tot) * s_tot / n_tot
    assert abs(ssb) < 1e-9


def test_anova_f_matches_flat_decomposition():
    rng = np.random.default_rng(3)
    groups = [rng.integers(0, 100, n).astype(np.int64)
              for n in (50, 80, 40)]
    ns = [len(g) for g in groups]
    ss = [int(g.sum()) for g in groups]
    qs = [int((g * g).sum()) for g in groups]
    n_tot, s_tot, q_tot = sum(ns), sum(ss), sum(qs)
    sb = sum(float(s * s) / n for s, n in zip(ss, ns))
    ssb = sb - float(s_tot) * s_tot / n_tot
    ssw = float(q_tot) - sb
    allv = np.concatenate(groups).astype(float)
    gm = allv.mean()
    ssb_ref = sum(n * (g.mean() - gm) ** 2 for g, n in zip(groups, ns))
    ssw_ref = sum(((g - g.mean()) ** 2).sum() for g in groups)
    assert abs(ssb - ssb_ref) < 1e-6
    assert abs(ssw - ssw_ref) < 1e-6


def _runs_stats(series):
    diffs = np.diff(np.asarray(series, dtype=np.int64))
    sgn = np.sign(diffs[diffs != 0])
    n_up = int((sgn > 0).sum())
    n_dn = int((sgn < 0).sum())
    runs = int(1 + (sgn[1:] != sgn[:-1]).sum()) if len(sgn) else 0
    return n_up, n_dn, runs


def test_runs_alternating_sequence_maximal_runs():
    # strictly alternating up/down → every sign flips → runs == len
    s = [0, 5, 1, 6, 2, 7, 3]
    n_up, n_dn, runs = _runs_stats(s)
    assert (n_up, n_dn) == (3, 3)
    assert runs == 6


def test_runs_monotone_sequence_single_run():
    n_up, n_dn, runs = _runs_stats([1, 2, 3, 4, 5])
    assert (n_up, n_dn, runs) == (4, 0, 1)


def test_runs_zero_diffs_dropped():
    # plateaus contribute no sign and do not break a run
    n_up, n_dn, runs = _runs_stats([1, 2, 2, 3, 2, 2, 1])
    assert (n_up, n_dn) == (2, 2)
    assert runs == 2

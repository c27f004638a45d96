"""Kernel-level semantics for the round-3 additions: PII redaction,
trailing-window aggregate boundaries, per-key smallest-k, and the
deterministic split hash. (Oracle parity for the full queries is
covered in test_queries.py's SUBSET.)"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from log_analysis_ai_ray.pipelines.queries import (
    IP_PAT, _SPLIT_A, _SPLIT_M, _SPLIT_TRAIN, _SPLIT_VAL,
    _smallest_k_per_key,
)


def test_ip_redaction_kernel():
    lines = pa.array([
        "INFO Connection from 10.0.0.1 accepted",
        "two 1.2.3.4 and 255.255.255.255 here",
        "no ip, just a float 3.14 and version 1.2.3",
        "",
    ])
    red = pc.replace_substring_regex(lines, pattern=IP_PAT,
                                     replacement="<IP>")
    n = pc.count_substring_regex(lines, pattern=IP_PAT)
    assert red.to_pylist() == [
        "INFO Connection from <IP> accepted",
        "two <IP> and <IP> here",
        "no ip, just a float 3.14 and version 1.2.3",
        "",
    ]
    assert n.to_pylist() == [1, 2, 0, 0]


def test_smallest_k_per_key_kernel():
    t = pa.table({
        "k": ["b", "a", "b", "a", "b", "c"],
        "v": [5, 2, 1, 9, 3, 7],
    })
    out = _smallest_k_per_key(t, "k", "v", 2)
    got = sorted(zip(out.column("k").to_pylist(),
                     out.column("v").to_pylist()))
    # per key: a -> {2, 9}, b -> {1, 3}, c (smaller than k) -> {7}
    assert got == [("a", 2), ("a", 9), ("b", 1), ("b", 3), ("c", 7)]
    # k larger than every group: identity (as a set)
    out_all = _smallest_k_per_key(t, "k", "v", 10)
    assert out_all.num_rows == t.num_rows
    # empty input survives
    empty = _smallest_k_per_key(t.slice(0, 0), "k", "v", 2)
    assert empty.num_rows == 0


def test_trailing_window_respects_group_boundaries():
    """The w_sum/w_n window in events_moving_avg must reset at each
    key boundary — replicate the kernel on a crafted series."""
    types = np.asarray(["a", "a", "a", "a", "a", "b", "b"])
    cnt = np.asarray([1, 2, 3, 4, 5, 10, 20], dtype=np.int64)
    n = len(cnt)
    new_grp = np.concatenate(([True], types[1:] != types[:-1]))
    grp_start = np.maximum.accumulate(np.where(new_grp, np.arange(n), 0))
    starts = np.maximum(grp_start, np.arange(n) - 3)
    csum = np.concatenate(([0], np.cumsum(cnt)))
    w_sum = csum[np.arange(n) + 1] - csum[starts]
    w_n = np.arange(n) - starts + 1
    assert w_sum.tolist() == [1, 3, 6, 10, 14, 10, 30]
    assert w_n.tolist() == [1, 2, 3, 4, 4, 1, 2]


def test_split_hash_deterministic_and_order_free():
    ids = np.arange(10_000, dtype=np.uint64)
    h = (ids * _SPLIT_A) % _SPLIT_M
    split = np.where(h < _SPLIT_TRAIN, "train",
                     np.where(h < _SPLIT_VAL, "val", "test"))
    # fractions near 0.8/0.1/0.1 (multiplicative hash equidistribution)
    frac_train = (split == "train").mean()
    frac_val = (split == "val").mean()
    assert 0.77 < frac_train < 0.83
    assert 0.08 < frac_val < 0.12
    # membership depends only on the id: permuting rows changes nothing
    perm = np.random.default_rng(0).permutation(len(ids))
    h2 = (ids[perm] * _SPLIT_A) % _SPLIT_M
    assert (h2 == h[perm]).all()

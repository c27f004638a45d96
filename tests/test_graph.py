"""Connected components (min-label + pointer-jumping) vs union-find."""

import numpy as np
import pyarrow as pa

from log_analysis_ai_ray.stages.graph import connected_components


def _uf_reference(edges):
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = sorted({x for e in edges for x in e})
    return {n: find(n) for n in nodes}


def _check(edges):
    t = pa.table({"doc_a": pa.array([a for a, _ in edges], type=pa.int64()),
                  "doc_b": pa.array([b for _, b in edges], type=pa.int64())})
    out = connected_components(t)
    got = dict(zip(out["node"].to_pylist(),
                   out["component_root"].to_pylist()))
    assert got == _uf_reference(edges)


def test_long_path_converges_fast():
    # a 3000-node path has diameter 2999; pointer jumping must converge
    # well inside max_iters=64
    _check([(i, i + 1) for i in range(3000)])


def test_random_graphs_match_union_find():
    rng = np.random.default_rng(13)
    for trial in range(10):
        n = int(rng.integers(5, 400))
        m = int(rng.integers(1, 3 * n))
        edges = [(int(rng.integers(0, n)), int(rng.integers(0, n)))
                 for _ in range(m)]
        edges = [(a, b) for a, b in edges if a != b] or [(0, 1)]
        _check(edges)


def test_star_and_disjoint():
    _check([(100, i) for i in range(5)] + [(200, 201), (201, 202)])

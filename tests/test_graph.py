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

def test_dataset_algebra_path_matches_in_memory(ray_session):
    """The distributed per-round form must produce the identical
    (node, component_root) labeling as the driver-side propagation."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from log_analysis_ai_ray.stages.graph import (
        connected_components, connected_components_dataset,
        connected_components_ds)

    rng = np.random.default_rng(23)
    # several chains + stars + isolated pairs → nontrivial diameters
    # (chains exercise the pointer-jump shortcut: diameter ≈ 20 must
    # converge in ~log rounds, each round costing fixed shuffle time)
    edges = []
    base = 0
    for comp in range(8):
        n = int(rng.integers(2, 22))
        nodes = base + np.arange(n)
        base += n + 3  # gaps: ids are sparse
        if comp % 3 == 0:  # chain (diameter n-1)
            edges += [(int(nodes[i]), int(nodes[i + 1]))
                      for i in range(n - 1)]
        elif comp % 3 == 1:  # star
            edges += [(int(nodes[0]), int(x)) for x in nodes[1:]]
        else:  # random tree + extra edges
            for i in range(1, n):
                edges.append((int(nodes[rng.integers(0, i)]), int(nodes[i])))
            for _ in range(3):
                a, b = rng.integers(0, n, 2)
                if a != b:
                    edges.append((int(nodes[a]), int(nodes[b])))
    t = pa.table({
        "doc_a": pa.array([a for a, _ in edges], type=pa.int64()),
        "doc_b": pa.array([b for _, b in edges], type=pa.int64()),
    })
    expected = connected_components(t)
    got = connected_components_dataset(
        ray.data.from_arrow(t).repartition(5))
    assert got.equals(expected)

    # the entry point routes past driver_max_edges to the dataset path
    # (tiny graph: just proves the routing, not the algebra again)
    t2 = pa.table({"doc_a": pa.array([0, 1, 5], type=pa.int64()),
                   "doc_b": pa.array([1, 2, 6], type=pa.int64())})
    routed = connected_components_ds(
        ray.data.from_arrow(t2).repartition(2), driver_max_edges=2)
    assert routed.equals(connected_components(t2))


def test_dataset_algebra_empty_edges(ray_session):
    import pyarrow as pa
    import ray.data

    from log_analysis_ai_ray.stages.graph import \
        connected_components_dataset

    t = pa.table({"doc_a": pa.array([], type=pa.int64()),
                  "doc_b": pa.array([], type=pa.int64())})
    out = connected_components_dataset(ray.data.from_arrow(t))
    assert out.num_rows == 0
    assert out.column_names == ["node", "component_root"]


def test_kcore_peel_matches_bruteforce():
    """Fixed-round peel equals the iterate-to-convergence 3-core on a
    graph with a chain (peels), a triangle fringe (peels at k=3), and
    a K5 core (survives)."""
    import numpy as np

    from log_analysis_ai_ray.stages.graph import kcore_peel

    edges = set()
    for i in range(5):           # K5: nodes 0..4, degree 4 each
        for j in range(i + 1, 5):
            edges.add((i, j))
    edges |= {(4, 5), (5, 6), (6, 7)}   # chain tail
    edges |= {(0, 8), (1, 8), (8, 9), (0, 9)}  # fringe, deg<3 eventually
    a = np.array([e[0] for e in edges] + [e[1] for e in edges])
    b = np.array([e[1] for e in edges] + [e[0] for e in edges])
    deg = kcore_peel(a, b, 10, k=3, rounds=16)
    # brute force to convergence
    cur = {(x, y) for x, y in zip(a.tolist(), b.tolist())}
    while True:
        from collections import Counter

        d = Counter(x for x, _ in cur)
        nxt = {(x, y) for x, y in cur if d[x] >= 3 and d[y] >= 3}
        if nxt == cur:
            break
        cur = nxt
    want = Counter(x for x, _ in cur)
    assert {i: int(v) for i, v in enumerate(deg) if v} == dict(want)
    assert set(want) == {0, 1, 2, 3, 4}  # only the K5 survives k=3

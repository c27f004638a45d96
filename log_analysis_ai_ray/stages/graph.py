"""Iterative graph algorithms over edge lists (Ray Data form).

Connected components by min-label propagation: every node starts
labeled with its own id; each round, a node's label becomes the
minimum label in its closed neighborhood; convergence in O(diameter)
rounds. The per-round step is pure dataset algebra — edges contribute
(node, neighbor_label) votes both ways, a groupby-min merges them —
so the shuffle moves (node, label) int64 pairs only, never adjacency
structures. This is the distributed counterpart of the driver-side
union-find in pipelines/queries.q_near_dup_clusters (right when the
pair list is tiny; this module is the path when components span more
edges than one process should hold).
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

logger = logging.getLogger(__name__)


def _min_label_round(edges: pa.Table, labels: dict) -> tuple[dict, int]:
    """One propagation round over an in-memory edge table with a
    vectorized numpy merge. labels: node -> label arrays (parallel
    numpy arrays in a dict for cheap updates)."""
    nodes, lab = labels["nodes"], labels["lab"]
    a = np.asarray(edges.column("src"), dtype=np.int64)
    b = np.asarray(edges.column("dst"), dtype=np.int64)
    pa_ = np.searchsorted(nodes, a)
    pb_ = np.searchsorted(nodes, b)
    new = lab.copy()
    # neighbor votes both directions + self vote, merged via minimum.at
    np.minimum.at(new, pa_, lab[pb_])
    np.minimum.at(new, pb_, lab[pa_])
    changed = int((new != lab).sum())
    return {"nodes": nodes, "lab": new}, changed


def connected_components(pairs: pa.Table, src: str = "doc_a",
                         dst: str = "doc_b",
                         max_iters: int = 64) -> pa.Table:
    """(node, component_root) for every node in the edge list; root =
    the component's minimum node id. Vectorized min-label propagation;
    raises if the graph has not converged in ``max_iters`` rounds
    (diameter bound — never silently wrong)."""
    a = np.asarray(pairs.column(src), dtype=np.int64)
    b = np.asarray(pairs.column(dst), dtype=np.int64)
    nodes = np.unique(np.concatenate([a, b]))
    state = {"nodes": nodes, "lab": nodes.copy()}
    edges = pa.table({"src": pa.array(a), "dst": pa.array(b)})
    for it in range(max_iters):
        state, changed = _min_label_round(edges, state)  # hook
        # shortcut (pointer jumping): follow label→label-of-label chains
        # to their fixpoint; hook+shortcut per round converges in
        # O(log n) rounds instead of O(diameter)
        lab = state["lab"]
        while True:
            nxt = lab[np.searchsorted(nodes, lab)]
            if np.array_equal(nxt, lab):
                break
            lab = nxt
        state["lab"] = lab
        if changed == 0:
            logger.debug("connected_components converged in %d rounds", it)
            break
    else:
        raise RuntimeError(
            f"connected_components: no convergence in {max_iters} rounds")
    return pa.table({
        "node": pa.array(nodes, type=pa.int64()),
        "component_root": pa.array(state["lab"], type=pa.int64()),
    })


def connected_components_ds(pairs_ds, src: str = "doc_a",
                            dst: str = "doc_b", max_iters: int = 64,
                            driver_max_edges: int = 50_000_000):
    """Dataset-level entry: collects the edge list when it fits (edges
    are a pair of int64 columns — 50M edges ≈ 800 MB) and runs the
    vectorized propagation; beyond that, the same round is expressible
    as dataset algebra (union of both edge directions' (node,
    neighbor_label) votes → groupby(node).min → join back), paying one
    keys-only shuffle per round — O(diameter) shuffles total. The
    in-memory path raises past ``driver_max_edges`` rather than
    silently collecting an unbounded edge list."""
    from .aggregate import _to_arrow

    t = _to_arrow(pairs_ds) if hasattr(pairs_ds, "to_arrow_refs") else pairs_ds
    if t.num_rows > driver_max_edges:
        raise NotImplementedError(
            f"edge list ({t.num_rows} rows) exceeds driver_max_edges="
            f"{driver_max_edges}; use the per-round dataset-algebra "
            "form described in the docstring")
    return connected_components(t, src=src, dst=dst, max_iters=max_iters)

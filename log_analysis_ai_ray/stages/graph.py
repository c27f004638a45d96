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


def _min_label_round(labels: dict, pa_: np.ndarray,
                     pb_: np.ndarray) -> tuple[dict, int]:
    """One propagation round with PRE-COMPUTED endpoint ranks — the
    nodes/edges never change across rounds, so the searchsorted and
    Arrow→numpy extraction are loop-invariant (round-4 review: the
    old per-round recompute cost O(E log V) × rounds for nothing)."""
    nodes, lab = labels["nodes"], labels["lab"]
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
    pa_ = np.searchsorted(nodes, a)   # loop-invariant endpoint ranks
    pb_ = np.searchsorted(nodes, b)
    for it in range(max_iters):
        state, changed = _min_label_round(state, pa_, pb_)  # hook
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


def connected_components_dataset(edges_ds, src: str = "doc_a",
                                 dst: str = "doc_b",
                                 max_iters: int = 64) -> pa.Table:
    """Distributed min-label propagation in pure dataset algebra: the
    driver never holds the edge list or the label table.

    State per round is a (node, label) Dataset. One round costs three
    keys-only shuffles:
      1. send: groupby(key) over [label rows ∪ edge-endpoint messages]
         — each node's current label is forwarded to every neighbor
         (plus a flagged self-vote);
      2. reduce: groupby(node) over the votes — new label = min vote;
         ``changed`` is computed against the flagged old label;
      3. shortcut: a pointer-jump shuffle (L[n] := L[L[n]]) that
         halves label-chain depth, so hook+shortcut converges in
         O(log n) rounds instead of O(diameter).
    Rounds repeat until no label changes (raises at ``max_iters`` —
    never silently wrong). Shuffled rows are int64 triples only;
    adjacency never moves after the one-time message materialization.
    Returns the same (node, component_root) table as the in-memory
    path (parity-tested)."""
    NONE = np.int64(-(2 ** 62))  # sentinel: "no value" (ids are >= 0)

    def to_msgs(t: pa.Table) -> pa.Table:
        a = np.asarray(t.column(src), dtype=np.int64)
        b = np.asarray(t.column(dst), dtype=np.int64)
        return pa.table({
            "key": pa.array(np.concatenate([a, b]), type=pa.int64()),
            "other": pa.array(np.concatenate([b, a]), type=pa.int64()),
            "label": pa.array(np.full(2 * len(a), NONE), type=pa.int64()),
        })

    msgs = edges_ds.map_batches(to_msgs, batch_format="pyarrow") \
        .materialize()
    if msgs.count() == 0:
        return pa.table({"node": pa.array([], type=pa.int64()),
                         "component_root": pa.array([], type=pa.int64())})

    def init_partial(t: pa.Table) -> pa.Table:
        keys = t.column("key")
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        uniq = pc.unique(keys)
        return pa.table({"node": uniq, "label": uniq})

    from ray.data.aggregate import Min, Sum

    labels = msgs.map_batches(init_partial, batch_format="pyarrow") \
        .groupby("node").aggregate(Min("label", alias_name="label")) \
        .materialize()

    def tag_labels(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "key": t.column("node"),
            "other": pa.array(np.full(n, NONE), type=pa.int64()),
            "label": t.column("label"),
        })

    def send(group: pa.Table) -> pa.Table:
        group = group.combine_chunks()
        lab_col = np.asarray(group.column("label"), dtype=np.int64)
        has_label = lab_col != NONE
        lab = np.int64(lab_col[has_label].min())
        key = np.int64(np.asarray(group.column("key"))[0])
        others = np.asarray(group.column("other"), dtype=np.int64)
        others = others[others != NONE]
        nodes = np.concatenate([[key], others])
        return pa.table({
            "node": pa.array(nodes, type=pa.int64()),
            "vote": pa.array(np.full(len(nodes), lab), type=pa.int64()),
            # the self-vote carries the old label for change detection
            "old": pa.array(np.concatenate(
                [[lab], np.full(len(others), NONE)]), type=pa.int64()),
        })

    def reduce_votes(group: pa.Table) -> pa.Table:
        group = group.combine_chunks()
        votes = np.asarray(group.column("vote"), dtype=np.int64)
        olds = np.asarray(group.column("old"), dtype=np.int64)
        old = np.int64(olds[olds != NONE].min())
        new = np.int64(votes.min())
        return pa.table({
            "node": group.column("node").slice(0, 1),
            "label": pa.array([new], type=pa.int64()),
            "changed": pa.array([int(new != old)], type=pa.int64()),
        })

    def to_jump_req(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "key": t.column("label"),
            "other": t.column("node"),
            "label": pa.array(np.full(n, NONE), type=pa.int64()),
        })

    def resolve_jump(group: pa.Table) -> pa.Table:
        group = group.combine_chunks()
        lab_col = np.asarray(group.column("label"), dtype=np.int64)
        lab = np.int64(lab_col[lab_col != NONE].min())
        others = np.asarray(group.column("other"), dtype=np.int64)
        others = others[others != NONE]
        return pa.table({
            "node": pa.array(others, type=pa.int64()),
            "label": pa.array(np.full(len(others), lab), type=pa.int64()),
        })

    def jump(lab_ds):
        """One pointer-jump shuffle: L[n] := L[L[n]]. Label values are
        always node ids, so every request key has a provider row;
        each node emits exactly one request → exactly one output row."""
        tagged = lab_ds.map_batches(tag_labels, batch_format="pyarrow") \
            .union(lab_ds.map_batches(to_jump_req, batch_format="pyarrow"))
        return tagged.groupby("key").map_groups(resolve_jump,
                                                batch_format="pyarrow")

    for it in range(max_iters):
        tagged = labels.map_batches(tag_labels, batch_format="pyarrow") \
            .union(msgs)
        votes = tagged.groupby("key").map_groups(send,
                                                 batch_format="pyarrow")
        new_labels = votes.groupby("node").map_groups(
            reduce_votes, batch_format="pyarrow").materialize()
        changed = new_labels.sum("changed")
        if not changed:
            labels = new_labels.drop_columns(["changed"]).materialize()
            logger.debug(
                "connected_components_dataset converged in %d rounds", it)
            break
        # hook (propagation) + shortcut (jump) per round → O(log n)
        # rounds instead of O(diameter)
        labels = jump(new_labels.drop_columns(["changed"])).materialize()
    else:
        raise RuntimeError(
            f"connected_components_dataset: no convergence in "
            f"{max_iters} rounds")
    from .aggregate import _to_arrow

    out = _to_arrow(labels).rename_columns(["node", "component_root"])
    return out.sort_by("node")


def connected_components_ds(pairs_ds, src: str = "doc_a",
                            dst: str = "doc_b", max_iters: int = 64,
                            driver_max_edges: int = 50_000_000):
    """Dataset-level entry: collects the edge list when it fits (edges
    are a pair of int64 columns — 50M edges ≈ 800 MB) and runs the
    vectorized in-memory propagation; beyond ``driver_max_edges`` the
    per-round dataset-algebra form (connected_components_dataset)
    runs instead — the driver never holds the edges."""
    if hasattr(pairs_ds, "to_arrow_refs"):
        pairs_ds = pairs_ds.materialize()  # count + reuse, one execution
        if pairs_ds.count() > driver_max_edges:
            return connected_components_dataset(
                pairs_ds, src=src, dst=dst, max_iters=max_iters)
        from .aggregate import _to_arrow

        t = _to_arrow(pairs_ds)
    else:
        t = pairs_ds
    return connected_components(t, src=src, dst=dst, max_iters=max_iters)


def kcore_peel(a: np.ndarray, b: np.ndarray, n_nodes: int, k: int,
               rounds: int) -> np.ndarray:
    """Fixed-round k-core peeling over an undirected edge list given
    as BOTH orientations (every undirected edge appears as (a,b) AND
    (b,a), so a node's degree is its count in ``a``). Each round drops
    nodes with degree < k and every edge touching them; ``rounds`` is
    fixed so an SQL mirror can unroll the identical chain (early exit
    when a round removes nothing — the result equals running all
    rounds). Returns the per-node degree AFTER peeling (0 = peeled).

    At driver-prohibitive edge counts each round is one groupby-count
    plus two semijoin exchanges — the connected_components_dataset
    shape; this kernel is the bounded/collected form."""
    a = np.asarray(a, dtype=np.int64)
    b = np.asarray(b, dtype=np.int64)
    for _ in range(rounds):
        deg = np.bincount(a, minlength=n_nodes)
        alive = deg >= k
        m = alive[a] & alive[b]
        if m.all():
            break
        a, b = a[m], b[m]
    return np.bincount(a, minlength=n_nodes)

"""Drain template mining, Ray-Data-first.

Algorithm re-implemented from the reference's semantics
(``/root/reference/src/drain_parser.cpp:278-494``): fixed-depth prefix
tree rooted on token count (:296), descent on the first ``depth-2``
tokens with numeric tokens pre-wildcarded at the tree level (:312) and a
``max_children`` wildcard fallback branch (:317-331); leaf clusters
matched by positional similarity (:427-439) with threshold ``sim_th``;
matched cluster templates wildcard monotonically (:444-481). This is a
fresh Python implementation of the published Drain algorithm (He et al.,
ICWS 2017), not a translation of the reference's C++.

### Determinism strategy (SURVEY.md §3.4)

The reference mines one tree per worker thread with its own id counter,
so cluster ids are nondeterministic; its Python layer re-canonicalizes
by hashing the template string. We go further for exact parallelism
invariance:

1. lines are deterministically normalized (stages/masking.py) — the
   masked string is a pure function of the line;
2. per-batch local dedup + a small ``groupby(masked).sum`` collects the
   DISTINCT masked strings with counts (cardinality is bounded by the
   template/vocabulary structure of logs — the premise of template
   mining — and crucially NOT proportional to row count);
3. the driver mines the distinct set ONCE, in sorted order → the
   masked→template mapping is a pure function of the data set, not of
   parallelism or arrival order;
4. a broadcast mapping (``ray.put`` once, dereferenced in each
   assigner actor's ``__init__``) vectorized-joins templates back onto
   lines via ``pc.index_in`` — no shuffle.

Template identity is the normalized template string; the routing key is
its md5-based hash (functions/hashing.py), reproducible in SQL.

For unbounded-vocabulary corpora the distinct set is capped: the top
``max_distinct`` masked strings by count are mined and the long tail is
assigned per-batch by the same Drain matcher inside the assigner actor
(state loaded once per actor) — documented scale path, exercised by
``test_drain.py::test_tail_fallback``.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import md5_hash32
from .masking import strip_header_array

WILDCARD = "<*>"


@dataclass
class DrainConfig:
    # Reference defaults: /root/reference/src/data_loader_config.h:32-34
    depth: int = 4
    sim_th: float = 0.5
    max_children: int = 100
    max_distinct: int = 2_000_000  # driver-side mining cap (scale guard)
    # Tree-descent convention. "paper": walk depth-2 prefix tokens
    # (root + leaf occupy two of `depth` levels — He et al., ICWS 2017
    # §III-B; the convention this engine defaults to, deliberately NOT
    # the reference's). "reference": walk min(depth, len) tokens as
    # /root/reference/src/drain_parser.cpp:308-312 does — a finer
    # partition that can keep clusters separate the paper tree merges.
    descend: str = "paper"


def _has_digit(token: str) -> bool:
    return any(c.isdigit() for c in token)


class _Cluster:
    __slots__ = ("tokens", "members")

    def __init__(self, tokens: list[str]):
        self.tokens = list(tokens)
        self.members: list[int] = []  # indices into the mined input list

    @property
    def template(self) -> str:
        return " ".join(self.tokens)


class DrainMiner:
    """Sequential Drain over token sequences. Deterministic given input
    order; the pipeline always feeds it sorted distinct masked strings."""

    def __init__(self, config: DrainConfig | None = None):
        self.config = config or DrainConfig()
        # tree: token_count -> nested dict keyed by token; leaf key None -> clusters
        self.root: dict[int, dict] = {}
        self.clusters: list[_Cluster] = []

    # -- tree walk ---------------------------------------------------------

    def _leaf(self, tokens: list[str], create: bool) -> list[_Cluster] | None:
        node = self.root.get(len(tokens))
        if node is None:
            if not create:
                return None
            node = self.root[len(tokens)] = {}
        # Descent count per DrainConfig.descend: paper convention
        # (depth-2 prefix tokens) by default, or the reference's
        # min(depth, len) (drain_parser.cpp:308-312).
        if self.config.descend == "reference":
            max_levels = min(self.config.depth, len(tokens))
        else:
            max_levels = max(self.config.depth - 2, 0)
        for tok in tokens[:max_levels]:
            # Tree-level pre-wildcard: the reference wildcards tokens
            # containing digits (drain_parser.cpp:312); our input is
            # already masked, so the analog is "token contains <*>".
            key = WILDCARD if (WILDCARD in tok or _has_digit(tok)) else tok
            child = node.get(key)
            if child is None:
                if not create:
                    # fall back to the wildcard branch before giving up
                    child = node.get(WILDCARD)
                    if child is None:
                        return None
                elif key != WILDCARD and len(node) >= self.config.max_children:
                    child = node.setdefault(WILDCARD, {})
                else:
                    child = node[key] = {}
            node = child
        return node.setdefault(None, []) if create else node.get(None)

    @staticmethod
    def _similarity(ctokens: list[str], tokens: list[str]) -> float:
        """Matching positions / length; cluster wildcards count as match
        (reference similarity: /root/reference/src/drain_parser.cpp:427-439)."""
        if not ctokens:
            return 1.0
        same = sum(1 for a, b in zip(ctokens, tokens) if a == b or a == WILDCARD)
        return same / len(ctokens)

    def _best(self, clusters: list[_Cluster], tokens: list[str]):
        best, best_sim = None, -1.0
        for c in clusters:
            sim = self._similarity(c.tokens, tokens)
            if sim > best_sim:
                best, best_sim = c, sim
        if best is not None and best_sim >= self.config.sim_th:
            return best
        return None

    # -- public API --------------------------------------------------------

    def add(self, masked: str, member_id: int | None = None) -> _Cluster:
        tokens = masked.split(" ")
        leaf = self._leaf(tokens, create=True)
        cluster = self._best(leaf, tokens)
        if cluster is None:
            cluster = _Cluster(tokens)
            leaf.append(cluster)
            self.clusters.append(cluster)
        else:
            # merge: wildcard differing positions (monotone;
            # reference update_template, drain_parser.cpp:444-481)
            cluster.tokens = [
                a if a == b else WILDCARD
                for a, b in zip(cluster.tokens, tokens)
            ]
        if member_id is not None:
            cluster.members.append(member_id)
        return cluster

    def match(self, masked: str) -> _Cluster | None:
        """Match without mutating the tree (assignment-only path)."""
        tokens = masked.split(" ")
        leaf = self._leaf(tokens, create=False)
        if not leaf:
            return None
        return self._best(leaf, tokens)


def mine_mapping(distinct_masked: list[str],
                 config: DrainConfig | None = None) -> pa.Table:
    """Mine sorted distinct masked strings → mapping table
    ``(masked, template, template_hash, wildcard_pos: list<int32>)``.

    Mining mutates templates monotonically, so the final mapping
    re-reads each cluster's FINAL template for all its members — every
    masked string maps to the settled template, independent of mining
    order interleaving.
    """
    config = config or DrainConfig()
    miner = DrainMiner(config)
    ordered = sorted(distinct_masked)
    for i, m in enumerate(ordered):
        miner.add(m, member_id=i)

    masked_out, template_out, hash_out, wpos_out = [], [], [], []
    for c in miner.clusters:
        tmpl = c.template
        h = md5_hash32(tmpl)
        wpos = [i for i, t in enumerate(c.tokens) if t == WILDCARD]
        for mid in c.members:
            masked_out.append(ordered[mid])
            template_out.append(tmpl)
            hash_out.append(h)
            wpos_out.append(wpos)
    return pa.table({
        "masked": pa.array(masked_out, type=pa.string()),
        "template": pa.array(template_out, type=pa.string()),
        "template_hash": pa.array(hash_out, type=pa.int64()),
        "wildcard_pos": pa.array(wpos_out, type=pa.list_(pa.int32())),
    })


# ---------------------------------------------------------------------------
# Ray Data stages
# ---------------------------------------------------------------------------


def partial_distinct_counts(batch: pa.Table,
                            col: str = "masked") -> pa.Table:
    """Per-batch combiner: distinct masked values + local counts.

    Shrinks the shuffle for the global ``groupby(masked)`` from
    O(lines) to O(distinct-per-block) rows.
    """
    return (
        pa.table({col: batch.column(col)})
        .group_by(col)
        .aggregate([([], "count_all")])
        .rename_columns([col, "cnt"])
    )


def collect_distinct_masked(lines_ds, config: DrainConfig | None = None,
                            col: str = "masked"):
    """Distinct masked strings + global counts (small driver-side table).

    lines_ds must already have the ``masked`` column. Returns a pyarrow
    table sorted by masked string. Wide step: groupby over the already
    per-block-deduped partials.
    """
    from .aggregate import _combine_partials

    config = config or DrainConfig()
    partial = lines_ds.map_batches(
        partial_distinct_counts, batch_format="pyarrow", batch_size=None,
        fn_kwargs={"col": col},
    )
    # one execution: materialize the small per-block distinct counts and
    # merge (driver-side pyarrow below the size threshold, Ray groupby
    # beyond) — see aggregate._combine_partials
    out = _combine_partials(
        partial, keys=[col], aggs=[("cnt", "sum")],
        empty_schema=pa.schema([(col, pa.string()), ("cnt", pa.int64())]))
    if out.num_rows == 0:
        return pa.table({col: pa.array([], type=pa.string()),
                         "cnt": pa.array([], type=pa.int64())})
    if out.num_rows > config.max_distinct:
        # Scale guard: mine only the head by count; tail handled by the
        # assigner's Drain matcher fallback.
        out = out.sort_by([("cnt", "descending"), (col, "ascending")])
        out = out.slice(0, config.max_distinct)
    return out.sort_by(col)


class DrainOnlineMiner:
    """Per-actor STREAMING Drain mining — the reference's path-B
    semantics, where each worker owns a private tree
    (/root/reference/src/file_data_loader.cpp:369) and templates are
    canonicalized only afterwards by template STRING
    (python/logai_agent.py:293).

    Emits (…, template, template_hash) per line using the actor's tree
    state AT THAT MOMENT — later merges may wildcard further, so the
    same line can map to different templates across actors/runs. That
    nondeterminism is exactly why the deterministic distinct-driven
    pipeline is the default; this stage exists as the streaming/online
    alternative (no driver-side mining pass) with the registry merged
    by template string downstream.
    """

    def __init__(self, config: DrainConfig | None = None,
                 masked_col: str = "masked"):
        self.config = config or DrainConfig()
        self.miner = DrainMiner(self.config)
        self.masked_col = masked_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        masked = batch.column(self.masked_col)
        if isinstance(masked, pa.ChunkedArray):
            masked = masked.combine_chunks()
        uniq = pc.unique(masked)
        clusters = [self.miner.add(m) for m in uniq.to_pylist()]
        templates = pa.array([c.template for c in clusters],
                             type=pa.string())
        hashes = pa.array([md5_hash32(c.template) for c in clusters],
                          type=pa.int64())
        idx = pc.index_in(masked, uniq)
        out = batch.append_column("template", templates.take(idx))
        return out.append_column("template_hash", hashes.take(idx))


def online_registry(lines_ds, config: DrainConfig | None = None,
                    concurrency=2) -> pa.Table:
    """Registry from per-actor online mining, merged by template string
    (count only — the merge that makes per-actor ids irrelevant)."""
    from .aggregate import _combine_partials

    mined = lines_ds.map_batches(
        DrainOnlineMiner, fn_constructor_args=(config,),
        concurrency=concurrency, num_cpus=0.5,
        batch_format="pyarrow", batch_size=None)

    def partial(t: pa.Table) -> pa.Table:
        tt = (pa.table({"template": t.column("template")})
              .group_by("template").aggregate([([], "count_all")]))
        return tt.rename_columns(["template", "cnt"])

    out = _combine_partials(
        mined.map_batches(partial, batch_format="pyarrow"),
        keys=["template"], aggs=[("cnt", "sum")],
        empty_schema=pa.schema([("template", pa.string()),
                                ("cnt", pa.int64())]))
    return out.sort_by([("cnt", "descending"), ("template", "ascending")])


class TemplateAssigner:
    """Actor-pool stage: assign mined templates back onto lines.

    The mapping table is broadcast once (``ray.put`` upstream); each
    actor dereferences it in ``__init__`` (once per actor, not per
    batch) and builds O(1) lookup arrays + a Drain matcher for unseen
    masked values. ``__call__`` is fully vectorized: ``pc.index_in``
    joins, numpy offset arithmetic extracts wildcard-position params.
    """

    def __init__(self, mapping_ref, config: DrainConfig | None = None,
                 line_col: str = "line", masked_col: str = "masked"):
        import ray
        mapping: pa.Table = (
            ray.get(mapping_ref) if isinstance(mapping_ref, ray.ObjectRef)
            else mapping_ref
        )
        self.line_col = line_col
        self.masked_col = masked_col
        self.keys = mapping.column("masked").combine_chunks()
        self.templates = mapping.column("template").combine_chunks()
        self.hashes = mapping.column("template_hash").combine_chunks()
        self.wpos = mapping.column("wildcard_pos").combine_chunks()
        self.config = config or DrainConfig()
        # Matcher for masked values outside the mined head (scale path):
        # rebuilt per actor from the mapping's distinct templates.
        self._tail = DrainMiner(self.config)
        for tmpl in sorted(pc.unique(self.templates).to_pylist()):
            self._tail.add(tmpl)
        self._tail_cache: dict[str, tuple[str, int, list[int]]] = {}

    # tail-cache bound: the cache exists precisely for the unbounded-
    # vocabulary path (mine_file_fraction < 1 / max_distinct cap), so
    # without a cap a long-lived assigner actor grows linearly with
    # tail vocabulary until the worker OOMs (round-4 review finding).
    # Clear-on-full: O(1), and the hot masked strings repopulate in
    # one batch.
    TAIL_CACHE_MAX = 1_000_000

    def _lookup_tail(self, masked: str) -> tuple[str, int, list[int]]:
        hit = self._tail_cache.get(masked)
        if hit is None:
            c = self._tail.match(masked)
            tmpl = c.template if c is not None and len(c.tokens) == len(masked.split(" ")) else masked
            wpos = [i for i, t in enumerate(tmpl.split(" ")) if t == WILDCARD]
            hit = (tmpl, md5_hash32(tmpl), wpos)
            if len(self._tail_cache) >= self.TAIL_CACHE_MAX:
                self._tail_cache.clear()
            self._tail_cache[masked] = hit
        return hit

    def __call__(self, batch: pa.Table) -> pa.Table:
        masked = batch.column(self.masked_col)
        if isinstance(masked, pa.ChunkedArray):
            masked = masked.combine_chunks()
        idx = pc.index_in(masked, self.keys)
        template = self.templates.take(idx)
        thash = self.hashes.take(idx)
        wpos = self.wpos.take(idx)

        miss = pc.is_null(idx)
        if pc.any(miss).as_py():
            # Unseen masked values: per-DISTINCT miss resolution via the
            # Drain matcher (cached), then vectorized scatter.
            miss_np = np.asarray(miss)
            miss_rows = np.flatnonzero(miss_np)
            miss_vals = masked.take(pa.array(miss_rows)).to_pylist()
            uniq = {}
            for v in miss_vals:
                if v not in uniq:
                    uniq[v] = self._lookup_tail(v)
            t_list = template.to_pylist()
            h_np = thash.fill_null(0).to_numpy(zero_copy_only=False).copy()
            wpos_py = wpos.to_pylist()
            for r, v in zip(miss_rows, miss_vals):
                tmpl, h, wp = uniq[v]
                t_list[r] = tmpl
                h_np[r] = h
                wpos_py[r] = wp
            template = pa.array(t_list, type=pa.string())
            thash = pa.array(h_np, type=pa.int64())
            wpos = pa.array(wpos_py, type=pa.list_(pa.int32()))

        params = self._extract_params(batch, wpos)
        out = batch.append_column("template", template)
        out = out.append_column("template_hash", thash)
        out = out.append_column("params", params)
        return out

    def _extract_params(self, batch: pa.Table, wpos) -> pa.ListArray:
        """params[i] = tokens of line i at the template's wildcard
        positions — all offset arithmetic, no per-row Python."""
        stripped = strip_header_array(batch.column(self.line_col))
        if isinstance(stripped, pa.ChunkedArray):
            stripped = stripped.combine_chunks()
        toks = pc.split_pattern(stripped, pattern=" ")
        tok_flat = pc.list_flatten(toks)
        tok_off = np.asarray(toks.offsets, dtype=np.int64)
        tok_len = tok_off[1:] - tok_off[:-1]

        if isinstance(wpos, pa.ChunkedArray):
            wpos = wpos.combine_chunks()
        wp_flat = np.asarray(pc.list_flatten(wpos), dtype=np.int64)
        wp_parent = np.asarray(pc.list_parent_indices(wpos), dtype=np.int64)

        abs_idx = tok_off[:-1][wp_parent] + wp_flat
        valid = wp_flat < tok_len[wp_parent]
        abs_idx = abs_idx[valid]
        # new offsets: count of valid params per row
        counts = np.bincount(wp_parent[valid], minlength=batch.num_rows)
        new_off = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
        params_flat = tok_flat.take(pa.array(abs_idx))
        return pa.ListArray.from_arrays(pa.array(new_off, type=pa.int32()),
                                        params_flat)

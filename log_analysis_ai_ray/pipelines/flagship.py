"""The flagship pipeline: parse → enrich → route → aggregate.

Ray-Data-first shape (north_rule):

    read_parquet(pages, columns pruned)          # html never read
      → map_batches(pages_to_lines)              # explode+mask+parse, one fused
                                                 #   vectorized Arrow stage
      → [fit] distinct-masked partial dedup → groupby → driver Drain mine
      → map_batches(TemplateAssigner, actors)    # broadcast mapping join
      → map_batches(Enricher)                    # broadcast dict enrich
      → write_parquet partitioned by sink        # fan-out route
      + template registry / level counts / hour rollups / anomaly scores
        (partial+final aggregates)

Two passes over the input (mine, then assign) — recomputing the cheap
explode+mask is preferred to materializing the full line table
mid-pipeline, which would defeat streaming execution at 100 TB.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

import pyarrow as pa

from ..stages import aggregate as agg
from ..stages import route as route_mod
from ..stages.drain import DrainConfig, TemplateAssigner, collect_distinct_masked, mine_mapping
from ..stages.enrich import Enricher
from ..stages.explode import explode_lines
from ..stages.htmltext import ExtractHtmlText
from ..stages.masking import add_masked
from ..stages.parse import parse_lines
from ..sources.pages import read_pages
from ..state import checkpoint as ckpt
from ..state import metrics as metrics_mod
from .. import synth


@dataclass
class FlagshipConfig:
    num_sinks: int = route_mod.DEFAULT_NUM_SINKS
    drain: DrainConfig = field(default_factory=DrainConfig)
    # None → size the assigner pool to the cluster (scales with CPUs;
    # a fixed cap would flatline throughput beyond cap × 1 CPU)
    assigner_concurrency: int | tuple[int, int] | None = None
    # row-level lineage: carry the source parquet path through to the
    # routed sinks (group manifests already record partition-level
    # lineage; this adds per-row provenance at ~0 cost, dict-encoded)
    include_lineage: bool = False
    # force the actor-pool broadcast path regardless of mapping size
    # (exercises the large-vocabulary code path; auto otherwise)
    force_actor_assigner: bool = False
    # mine the template mapping from a FRACTION of input files (the
    # 100 TB path: template sets converge from samples; rows whose
    # masked string was unseen are matched by the per-actor Drain tail
    # matcher, so routed counts stay exact and deterministic)
    mine_file_fraction: float = 1.0
    domain_tiers: dict = field(default_factory=lambda: dict(synth.DOMAIN_TIERS))
    lang_names: dict = field(default_factory=lambda: dict(synth.LANG_NAMES))
    # input carries raw ``html`` only: extract text in-stage
    # (stages/htmltext.py, the byte-identity invariant) before the
    # explode+mask+parse pass. Same downstream results as the
    # pre-extracted path — pinned by tests/test_htmltext.py.
    from_html: bool = False
    # OUTPUT filesystem (pyarrow.fs): None → local. On a multi-node
    # cluster pass a shared fs (S3/HDFS/SubTree over a mount) so sinks,
    # registry, metrics and manifests land in one namespace instead of
    # scattering across worker-local disks. Inputs take their own fs
    # via read_pages(**kwargs).
    filesystem: object | None = None


def _assigner_concurrency(config: "FlagshipConfig"):
    if config.assigner_concurrency is not None:
        return config.assigner_concurrency
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    return (min(2, cpus), max(2, cpus))


def pages_to_lines(batch: pa.Table) -> pa.Table:
    """Fused explode + mask + parse — one Arrow pass per block."""
    carry = tuple(c for c in ("url", "warc_ts", "lang", "path")
                  if c in batch.column_names)
    lines = explode_lines(batch, carry=carry)
    lines = add_masked(lines)
    return parse_lines(lines)


# Raw-html input path: extract text (vectorized RE2), then the same
# fused pass. Module-level instances — the stage is stateless.
_EXTRACT = ExtractHtmlText(html_col="html", out_col="text")


def pages_to_lines_from_html(batch: pa.Table) -> pa.Table:
    return pages_to_lines(_EXTRACT(batch))


def pages_to_masked_from_html(batch: pa.Table) -> pa.Table:
    return pages_to_masked(_EXTRACT(batch))


def _default_blocks(pages_path=None) -> int:
    import ray

    cpus = max(4, int(ray.cluster_resources().get("CPU", 8)))
    n_files = None
    if isinstance(pages_path, str) and os.path.isdir(pages_path):
        from ..sources.pages import list_page_files
        n_files = len(list_page_files(pages_path))
    elif isinstance(pages_path, (list, tuple)):
        n_files = len(pages_path)
    # at least one block per CPU; keep per-block size bounded by using
    # the natural file granularity when it is finer
    return max(cpus, n_files or 0) or cpus


PAGE_COLUMNS_FROM_HTML = ["url", "warc_ts", "html", "lang"]


def build_lines(pages_path: str, from_html: bool = False, **read_kwargs):
    # one block per CPU: bounds downstream task count AND the sink file
    # count (hive writes emit blocks × sinks files)
    read_kwargs.setdefault("override_num_blocks", _default_blocks(pages_path))
    if from_html:
        read_kwargs.setdefault("columns", list(PAGE_COLUMNS_FROM_HTML))
    ds = read_pages(pages_path, **read_kwargs)
    # batch_size=None → whole-block batches: the stage is pure Arrow
    # kernels, so bigger batches amortize kernel dispatch
    fn = pages_to_lines_from_html if from_html else pages_to_lines
    return ds.map_batches(fn, batch_format="pyarrow",
                          batch_size=None, zero_copy_batch=True)


def pages_to_masked(batch: pa.Table) -> pa.Table:
    """Mine-pass-only variant of pages_to_lines: explode + mask, no
    level/timestamp parsing (the fit pass needs only masked strings)."""
    lines = explode_lines(batch, carry=())
    return add_masked(lines)


def fit_mapping(pages_path: str, config: FlagshipConfig | None = None) -> pa.Table:
    """Pass 1: mine the masked→template mapping (deterministic)."""
    config = config or FlagshipConfig()
    mine_path = pages_path
    if (config.mine_file_fraction < 1.0
            and isinstance(pages_path, str) and os.path.isdir(pages_path)):
        from ..sources.pages import list_page_files

        files = list_page_files(pages_path)
        n = max(1, int(len(files) * config.mine_file_fraction))
        mine_path = files[:n]  # deterministic prefix sample
    ds = read_pages(
        mine_path,  # prune to the minimum the pass needs
        columns=["html"] if config.from_html else ["text"],
        override_num_blocks=_default_blocks(mine_path))
    lines = ds.map_batches(
        pages_to_masked_from_html if config.from_html else pages_to_masked,
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    distinct = collect_distinct_masked(lines, config.drain)
    return mine_mapping(distinct.column("masked").to_pylist(), config.drain)


def build_parsed(pages_path: str, mapping: pa.Table,
                 config: FlagshipConfig | None = None):
    """Pass 2: assign templates + enrich. Returns the parsed Dataset
    (lazy; consume by routing/aggregating)."""
    import ray

    config = config or FlagshipConfig()
    lines = build_lines(pages_path, from_html=config.from_html,
                        include_paths=config.include_lineage)
    if mapping.nbytes < 8 * 1024 * 1024 and not config.force_actor_assigner:
        # small mapping: ship the constructed assigner in the task
        # closure — skips actor-pool spin-up (a measurable fixed cost
        # per run). Large mappings (huge template vocabularies) use the
        # actor pool: broadcast once per actor via ray.put.
        assigner = TemplateAssigner(mapping, config.drain)
        parsed = lines.map_batches(
            assigner, batch_format="pyarrow", batch_size=None,
            zero_copy_batch=True,
        )
    else:
        mapping_ref = ray.put(mapping)
        parsed = lines.map_batches(
            TemplateAssigner,
            fn_constructor_args=(mapping_ref, config.drain),
            concurrency=_assigner_concurrency(config),
            batch_format="pyarrow",
            batch_size=None,
            zero_copy_batch=True,
        )
    enricher = Enricher(config.domain_tiers, config.lang_names)
    return parsed.map_batches(enricher, batch_format="pyarrow",
                              batch_size=None, zero_copy_batch=True)


def _read_routed(out_dir: str, filesystem=None):
    """Pruned columnar read-back of the routed sinks for aggregation."""
    import ray
    import ray.data

    files = route_mod.list_sink_files(out_dir, filesystem=filesystem)
    cpus = int(ray.cluster_resources().get("CPU", 8))
    # hive-partitioned writes produce blocks×sinks small files; coalesce
    # fragments into ~one read task per CPU instead of one per file
    return ray.data.read_parquet(
        files, columns=["template_hash", "template", "level", "line_ts",
                        "parse_ok"],
        filesystem=filesystem,
        override_num_blocks=min(len(files), cpus))


def run(pages_path: str, out_dir: str,
        config: FlagshipConfig | None = None,
        mapping: pa.Table | None = None) -> dict:
    """Full flagship run. Returns a result dict with the registry,
    rollups, manifest and metrics (small tables driver-side; bulk
    output lands as partitioned Parquet under out_dir)."""
    config = config or FlagshipConfig()
    t0 = time.time()
    if mapping is None:
        mapping = fit_mapping(pages_path, config)
    t_mine = time.time() - t0

    # Pass 2: ONE consumption routes rows to the sinks (side-effect
    # writes inside the fused stage) AND yields the combined aggregate
    # partials — no write-then-read-back, no third pass.
    parsed = build_parsed(pages_path, mapping, config)
    partials = route_mod.route_write_with_partials(
        parsed, out_dir, num_sinks=config.num_sinks,
        filesystem=config.filesystem)
    aggs = agg.finalize_combined(partials)
    registry, levels = aggs["registry"], aggs["levels"]
    rollup, quality = aggs["rollup"], aggs["quality"]
    t_route = time.time() - t0 - t_mine

    manifest = route_mod.sink_manifest_from_output(
        out_dir, filesystem=config.filesystem)
    t_total = time.time() - t0
    t_agg = t_total - t_mine - t_route

    metrics = {
        "rows_routed": manifest["total_rows"],
        "n_templates": registry.num_rows,
        "mine_sec": t_mine,
        # routing and aggregation are ONE fused pass by design, so
        # route_sec is that pass's full execution; agg_sec times only
        # the driver-side finalize + manifest recount (round-4 review:
        # the old labels implied a split the fused plan does not have)
        "route_agg_fused_sec": t_route,
        "route_sec": t_route,
        "agg_sec": t_agg,
        "total_sec": t_total,
        **quality,
    }
    fs = route_mod._resolve_fs(config.filesystem)
    metrics_mod.write_metrics(out_dir, "_metrics", metrics,
                              filesystem=config.filesystem)
    # Ray's own per-stage execution breakdown for the fused pass
    if agg.LAST_EXECUTION_STATS:
        with fs.open_output_stream(f"{out_dir}/_stats.txt") as f:
            f.write(agg.LAST_EXECUTION_STATS.encode())

    import pyarrow.parquet as pq
    for name, tbl in (("template_registry", registry),
                      ("rollups", rollup), ("level_counts", levels)):
        pq.write_table(tbl, f"{out_dir}/{name}.parquet", filesystem=fs)

    return {
        "registry": registry,
        "levels": levels,
        "rollup": rollup,
        "manifest": manifest,
        "metrics": metrics,
        "mapping": mapping,
    }


def run_checkpointed(pages_path: str, out_dir: str,
                     config: FlagshipConfig | None = None,
                     files_per_group: int = 4) -> dict:
    """Resumable variant: input files processed in groups; each group
    routes to its own subdirectory and writes a _done manifest entry;
    a rerun skips completed groups (state/checkpoint.py)."""
    import os

    from ..sources.pages import list_page_files

    config = config or FlagshipConfig()
    if config.filesystem is not None:
        # group manifests / _done markers / the mapping parquet are
        # driver-local files; running them against a remote output fs
        # would silently scatter sinks to worker-local disks while the
        # manifest claimed success (round-4 review finding)
        raise NotImplementedError(
            "run_checkpointed writes driver-local checkpoint "
            "manifests; remote filesystems are supported by run()")
    files = list_page_files(pages_path)
    groups = ckpt.plan_groups(files, files_per_group)
    # The mapping must be global & identical across groups/resumes: mine
    # once over the full input, persist, and reuse on resume.
    os.makedirs(out_dir, exist_ok=True)
    mapping_path = os.path.join(out_dir, "template_mapping.parquet")
    import pyarrow.parquet as pq
    if os.path.exists(mapping_path):
        mapping = pq.read_table(mapping_path)
    else:
        mapping = fit_mapping(pages_path, config)
        pq.write_table(mapping, mapping_path + ".tmp")
        os.replace(mapping_path + ".tmp", mapping_path)

    # stale-group hygiene: manifests/outputs past the new group count
    # (the file list shrank) would otherwise survive as orphan data
    import glob as _glob
    for mpath in _glob.glob(os.path.join(out_dir, "_done",
                                         "group-*.json")):
        gid_old = int(os.path.basename(mpath)[6:-5])
        if gid_old >= len(groups):
            os.remove(mpath)
            shutil_rm = os.path.join(out_dir, f"group-{gid_old:05d}")
            import shutil
            shutil.rmtree(shutil_rm, ignore_errors=True)

    skipped, ran = [], []
    for gid, group_files in enumerate(groups):
        # membership-aware: a shifted group (input list changed)
        # reruns instead of being skipped by positional id
        if ckpt.is_done(out_dir, gid, input_files=group_files):
            skipped.append(gid)
            continue
        parsed = build_parsed(group_files, mapping, config)
        gdir = os.path.join(out_dir, f"group-{gid:05d}")
        # idempotent retry: a partially-written group is replaced wholesale
        import shutil
        shutil.rmtree(gdir, ignore_errors=True)
        cols = (route_mod.ROUTED_COLUMNS + ["path"]
                if config.include_lineage else None)
        manifest = route_mod.route_and_write(parsed, gdir,
                                            num_sinks=config.num_sinks,
                                            columns=cols)
        ckpt.mark_done(out_dir, gid, group_files, manifest["total_rows"],
                       extra=manifest)
        ran.append(gid)
    done = ckpt.completed_groups(out_dir)
    return {
        "groups_ran": ran,
        "groups_skipped": skipped,
        "total_rows": sum(m["rows_out"] for m in done.values()),
        "mapping": mapping,
    }

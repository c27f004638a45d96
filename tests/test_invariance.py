"""Parallelism invariance (SURVEY.md §5.4): identical registry and
per-sink counts regardless of Ray parallelism. This is the gate the
reference would fail (per-thread Drain trees, SURVEY.md §3.4).

Full 8-vs-32-CPU fresh-process runs live in bench.py --scaling; here we
vary block structure (override_num_blocks) within one session, which
exercises the same order/partitioning sensitivity."""

import pyarrow as pa

from log_analysis_ai_ray.pipelines import flagship
from log_analysis_ai_ray.stages import aggregate as agg


def _registry(pages_dir, num_blocks, mapping=None):
    from log_analysis_ai_ray.sources.pages import read_pages

    cfg = flagship.FlagshipConfig()
    if mapping is None:
        mapping = flagship.fit_mapping(pages_dir, cfg)
    import ray

    from log_analysis_ai_ray.stages.drain import TemplateAssigner
    from log_analysis_ai_ray.stages.enrich import Enricher

    ds = read_pages(pages_dir, override_num_blocks=num_blocks)
    lines = ds.map_batches(flagship.pages_to_lines, batch_format="pyarrow")
    parsed = lines.map_batches(
        TemplateAssigner,
        fn_constructor_args=(ray.put(mapping), cfg.drain),
        concurrency=2, batch_format="pyarrow")
    parsed = parsed.map_batches(Enricher(cfg.domain_tiers, cfg.lang_names),
                                batch_format="pyarrow")
    return mapping, agg.template_registry(parsed)


def test_registry_invariant_to_block_structure(ray_session, pages_small):
    mapping, reg1 = _registry(pages_small, 1)
    _, reg8 = _registry(pages_small, 8, mapping)
    assert reg1.equals(reg8)


def test_mapping_invariant_to_block_structure(ray_session, pages_small):
    cfg = flagship.FlagshipConfig()
    from log_analysis_ai_ray.sources.pages import read_pages
    from log_analysis_ai_ray.stages.drain import collect_distinct_masked, mine_mapping

    maps = []
    for nb in (1, 7):
        ds = read_pages(pages_small, override_num_blocks=nb)
        lines = ds.map_batches(flagship.pages_to_lines, batch_format="pyarrow")
        distinct = collect_distinct_masked(lines, cfg.drain)
        maps.append(mine_mapping(distinct.column("masked").to_pylist(),
                                 cfg.drain))
    assert maps[0].equals(maps[1])

"""Composed training-data curation pipeline over the documents table:

    language-ID → quality gate → exact dedup (keep lowest doc_id)
    → optional MinHash near-dup removal → corpus stats

Every stage is one of the engine's vectorized operators
(stages/textstats.py, stages/dedup.py); the deterministic filter
cascade (without the near-dup stage) is fully SQL-expressible, so the
pipeline has an exact DuckDB oracle.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..stages.dedup import minhash_near_dups
from ..stages.textstats import (langid_features, oracle_langid_sql,
                                quality_features)


def curate(ds, keep_langs: tuple[str, ...] = ("en",),
           min_tokens: int = 5, min_alpha_pm: int = 500,
           drop_near_dups: bool = False,
           pairs_spill_dir: str | None = None):
    """Filter cascade; returns the kept-documents Dataset with feature
    columns. ``drop_near_dups`` adds the (non-SQL) MinHash stage."""
    def stage(batch: pa.Table) -> pa.Table:
        feats = langid_features(batch)
        qual = quality_features(batch)
        out = batch.append_column("pred_lang", feats.column("pred_lang"))
        out = out.append_column("n_tokens", qual.column("n_tokens"))
        out = out.append_column("alpha_pm", qual.column("alpha_pm"))
        keep = pc.and_(
            pc.is_in(out.column("pred_lang"),
                     value_set=pa.array(keep_langs, type=pa.string())),
            pc.and_(pc.greater_equal(out.column("n_tokens"), min_tokens),
                    pc.greater_equal(out.column("alpha_pm"), min_alpha_pm)))
        return out.filter(keep)

    kept = ds.map_batches(stage, batch_format="pyarrow", batch_size=None)

    if drop_near_dups:
        pairs = minhash_near_dups(kept, threshold=0.8,
                                  out_dir=pairs_spill_dir)
        if isinstance(pairs, pa.Table):
            drop = set(pairs.column("doc_b").to_pylist())  # keep lower id
            drop_arr = (pa.array(sorted(drop), type=pa.int64())
                        if drop else None)
        else:
            # pair-saturated corpus: the pair list lives as a spilled
            # Dataset; distill the distinct drop ids distributed
            from ..stages.aggregate import _combine_partials

            def db_part(t: pa.Table) -> pa.Table:
                col = t.column("doc_b")
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                return pa.table({"doc_b": pc.unique(col)})

            db = _combine_partials(
                pairs.map_batches(db_part, batch_format="pyarrow"),
                keys=["doc_b"], aggs=[],
                empty_schema=pa.schema([("doc_b", pa.int64())]))
            drop_arr = (pc.unique(db.column("doc_b").combine_chunks())
                        if db.num_rows else None)
        if drop_arr is not None and len(drop_arr):
            import ray

            # ship the drop set ONCE; tasks fetch from local plasma
            # instead of re-pickling ~MBs into every submission
            drop_ref = ray.put(drop_arr)

            def drop_filter(t: pa.Table) -> pa.Table:
                da = ray.get(drop_ref)
                return t.filter(pc.invert(pc.is_in(
                    t.column("doc_id"), value_set=da)))

            kept = kept.map_batches(drop_filter,
                                    batch_format="pyarrow")
    return kept


def curated_kept_docs(ds) -> pa.Table:
    """SQL-checkable core cascade: langid ∈ {en} + quality gates +
    exact dedup by text (keep min doc_id). Returns kept doc ids with
    features."""
    from ..stages.aggregate import _combine_partials

    kept = curate(ds)

    def partial(t: pa.Table) -> pa.Table:
        tt = (pa.table({
            "text": t.column("text"),
            "doc_id": t.column("doc_id"),
            "n_tokens": t.column("n_tokens"),
            "alpha_pm": t.column("alpha_pm"),
        }).group_by(["text"]).aggregate(
            [("doc_id", "min"), ("n_tokens", "min"), ("alpha_pm", "min")]))
        return tt.rename_columns(["text", "doc_id", "n_tokens", "alpha_pm"])

    merged = _combine_partials(
        kept.map_batches(partial, batch_format="pyarrow"),
        keys=["text"],
        aggs=[("doc_id", "min"), ("n_tokens", "min"), ("alpha_pm", "min")],
        empty_schema=pa.schema([
            ("text", pa.string()), ("doc_id", pa.int64()),
            ("n_tokens", pa.int64()), ("alpha_pm", pa.int64())]))
    return merged.select(["doc_id", "n_tokens", "alpha_pm"]) \
                 .sort_by("doc_id")


def oracle_curation_sql(min_tokens: int = 5, min_alpha_pm: int = 500) -> str:
    langid = oracle_langid_sql("documents")
    return f"""
WITH lid AS ({langid}),
q AS (SELECT doc_id, text,
             len(regexp_extract_all(text, '\\S+')) AS n_tokens,
             CAST((len(regexp_extract_all(text, '[A-Za-z]')) * 1000)
                  // greatest(length(text), 1) AS BIGINT) AS alpha_pm
      FROM documents),
kept AS (SELECT q.doc_id, q.text, q.n_tokens, q.alpha_pm
         FROM q JOIN lid USING (doc_id)
         WHERE lid.pred_lang = 'en'
           AND q.n_tokens >= {min_tokens}
           AND q.alpha_pm >= {min_alpha_pm})
SELECT min(doc_id) AS doc_id, min(n_tokens) AS n_tokens,
       min(alpha_pm) AS alpha_pm
FROM kept GROUP BY text ORDER BY doc_id
"""


def run_curation(input_parquet: str, out_dir: str, *,
                 keep_langs: tuple[str, ...] = ("en",),
                 min_tokens: int = 5, min_alpha_pm: int = 500,
                 drop_near_dups: bool = True) -> dict:
    """End-to-end curation job (the training-data counterpart of the
    flagship): read → langid/quality gates → normalization-aware exact
    dedup → optional MinHash near-dup removal → write the kept corpus
    as Parquet PARTITIONED BY predicted language, plus _metrics.json.

    The gated subset is materialized ONCE and every later consumer
    (stage counts, dedup keep-list, near-dup pairing, the final write)
    reuses those blocks instead of re-executing the cascade. The exact
    keep-list is distilled distributedly (hash partials) and broadcast
    as an id filter; past the driver-merge bound the same filter runs
    as a Bloom prefilter + partitioned verify join (stages/bloomjoin)."""
    import json
    import os
    import shutil

    import numpy as np
    import ray.data

    from ..stages.aggregate import _to_arrow
    from ..stages.dedup import exact_dedup_by_hash, normalize_text

    ds = ray.data.read_parquet(input_parquet).map_batches(
        lambda t: t.replace_schema_metadata(None),
        batch_format="pyarrow", zero_copy_batch=True)
    input_rows = ds.count()

    kept = curate(ds, keep_langs=keep_langs, min_tokens=min_tokens,
                  min_alpha_pm=min_alpha_pm,
                  drop_near_dups=drop_near_dups,
                  pairs_spill_dir=os.path.join(out_dir,
                                               "_near_dup_pairs")
                  ).materialize()
    gated_rows = kept.count()

    def norm(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t.column("doc_id"),
                         "text": normalize_text(t.column("text"))})

    keep_res = exact_dedup_by_hash(
        kept.map_batches(norm, batch_format="pyarrow"),
        out_dir=os.path.join(out_dir, "_keep_list"))
    if isinstance(keep_res, pa.Table):
        import ray

        keep_ref = ray.put(pa.array(
            np.sort(np.asarray(keep_res.column("keep_id"))),
            type=pa.int64()))

        def keep_filter(t: pa.Table) -> pa.Table:
            # ship ONCE via plasma, not ~40MB re-pickled per task
            ki = ray.get(keep_ref)
            return t.filter(pc.is_in(t.column("doc_id"),
                                     value_set=ki))

        final = kept.map_batches(keep_filter, batch_format="pyarrow")
    else:
        # keep-list past the driver merge bound: Bloom prefilter (the
        # bitmap broadcasts, keys never collect) + exact partitioned
        # semi-join against the spilled keep-list Dataset — the
        # documented at-scale filter shape
        import ray

        from ..stages.bloomjoin import BloomFilterStage, bloom_build
        from ..stages.joins import partitioned_lookup_join

        ids_only = keep_res.select_columns(["keep_id"])
        bm_ref = ray.put(bloom_build(ids_only, "keep_id"))
        pre = kept.map_batches(
            BloomFilterStage, fn_constructor_args=(bm_ref, "doc_id"),
            concurrency=2, num_cpus=0.5, batch_format="pyarrow")
        final = partitioned_lookup_join(
            pre, ids_only, left_key="doc_id", right_key="keep_id",
            take_cols=[],
            right_schema=pa.schema([("keep_id", pa.int64())]))

    docs_dir = os.path.join(out_dir, "docs")
    shutil.rmtree(docs_dir, ignore_errors=True)
    os.makedirs(docs_dir, exist_ok=True)
    final = final.materialize()
    out_rows = final.count()
    final.write_parquet(docs_dir, partition_cols=["pred_lang"])

    metrics = {"input_rows": int(input_rows),
               "kept_after_gates": int(gated_rows),
               "kept_after_dedup": int(out_rows),
               "near_dup_stage": bool(drop_near_dups),
               "out": docs_dir}
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "_metrics.json"), "w") as f:
        json.dump(metrics, f)
    return metrics

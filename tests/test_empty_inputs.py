"""Empty-corpus robustness for the round-3 session-4 operator family:
every query must return an empty (or trivially-degenerate) table on
schema-correct but row-free inputs, never raise. Exercises the
driver-side closes (cum[-1], unique loops, division guards) and the
empty-groups shuffle paths."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    src = "/root/testdata/sf0.001"
    out = tmp_path_factory.mktemp("empty_sf")
    for name in ("events", "documents", "embeddings", "orders",
                 "customer", "lineitem", "part", "supplier",
                 "nation", "region"):
        schema = pq.read_schema(os.path.join(src, f"{name}.parquet"))
        pq.write_table(schema.empty_table(),
                       os.path.join(str(out), f"{name}.parquet"))
    return str(out)


EMPTY_SAFE = [
    "events_trend_slope",
    "events_mad_outliers",
    "events_cusum_peak",
    "events_hopping_windows",
    "events_hourly_change",
    "events_range_sorted_sample",
    "user_value_skyline",
    "purchase_attribution",
    "weighted_doc_sample",
    "weighted_sample_wor",
    "bigram_pmi",
    "source_kl_divergence",
    "oov_ratio_by_source",
    "corpus_diff",
    "customer_coverage_days",
    "lineitem_qty_price_corr",
    "embedding_gram",
    "type_hour_residuals",
    "late_event_audit",
    "source_length_gini",
    "zorder_layout",
    "langid_confusion",
    "doc_compression_ratio",
]


@pytest.mark.parametrize("name", EMPTY_SAFE)
def test_query_survives_empty_input(ray_session, empty_sf, name):
    from log_analysis_ai_ray.pipelines.queries import QUERIES

    fn, _sql = QUERIES[name]
    res = fn(empty_sf)
    if isinstance(res, pa.Table):
        n = res.num_rows
    else:  # Dataset result
        n = res.count()
    assert n == 0

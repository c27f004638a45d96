"""Registry queries vs their DuckDB oracles — the same comparison the
driver runs (tools/selfcheck.py), kept green in-repo over a
representative subset at sf0.01."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.01"
SUBSET = [
    "level_counts", "masked_counts", "sink_counts", "domain_tier_counts",
    "events_type_quantiles", "doc_dedup_hash", "doc_langid",
    "customer_nation_counts", "knn_cosine",
    "csv_dimensions", "json_attrs", "syslog_decode", "logical_lines",
]


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _norm(df: pd.DataFrame) -> list:
    df = df[sorted(df.columns)]
    rows = df.astype(str).values.tolist()
    rows.sort()
    return rows


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(ray_session, oracle_con, name):
    from log_analysis_ai_ray.pipelines.queries import QUERIES

    fn, sql = QUERIES[name]
    assert sql is not None
    res = fn(SF_DIR)
    ours = res.to_pandas() if isinstance(res, pa.Table) else res.to_pandas()
    theirs = oracle_con.execute(sql).fetchdf()
    assert sorted(ours.columns) == sorted(theirs.columns)
    assert len(ours) == len(theirs)
    assert _norm(ours) == _norm(theirs)

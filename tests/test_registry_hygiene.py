"""Registry-wide hygiene gates: every oracle SQL must at least BIND
in DuckDB against the registered table views (catching syntax errors,
reserved-word collisions and bad casts without running data), and the
bench lists must reference real queries exactly once."""

import re

import duckdb
import pytest

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]
SF_DIR = "/root/testdata/sf0.001"


def _registry():
    from log_analysis_ai_ray.pipelines.queries import QUERIES

    return QUERIES


def test_query_names_are_unique_snake_case():
    q = _registry()
    assert len(q) == len(set(q))
    for name in q:
        assert re.fullmatch(r"[a-z0-9_]+", name), name


def test_every_entry_is_callable_with_optional_sql():
    q = _registry()
    for name, (fn, sql) in q.items():
        assert callable(fn), name
        assert sql is None or isinstance(sql, str), name


def test_oracle_sql_binds_in_duckdb():
    """EXPLAIN every oracle against the real sf0.001 views — a pure
    binder/planner pass (no execution), so the whole registry checks
    in seconds.  Catches the classes of breakage seen this round:
    reserved words, DECIMAL-typed recursion anchors, lateral range
    parameters, unbound columns."""
    q = _registry()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    # pages/rawlogs oracle SQL reads /tmp corpora that the full
    # selfcheck materializes; EXPLAIN still needs the files, so only
    # skip entries referencing them when absent.
    import os

    failures = []
    for name, (fn, sql) in q.items():
        if sql is None:
            continue
        if "/tmp/graft_pages" in sql or "/tmp/graft_rawlogs" in sql \
                or "read_parquet('/tmp/" in sql:
            continue
        try:
            con.execute("EXPLAIN " + sql)
        except Exception as e:  # pragma: no cover - failure detail
            failures.append((name, str(e).splitlines()[0]))
    assert not failures, failures


def test_bench_lists_reference_real_queries():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..",
                              "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    q = _registry()
    for name in bench.BENCH_QUERIES:
        assert name in q, name
    for name in bench.BENCH_EXTRA:
        assert name in q, name
    assert len(bench.BENCH_EXTRA) == len(set(bench.BENCH_EXTRA))
    assert not (set(bench.BENCH_QUERIES) & set(bench.BENCH_EXTRA))

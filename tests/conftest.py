import os

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def pages_small(tmp_path_factory):
    """800 pages, 4 shards — the standard small corpus for tests."""
    from log_analysis_ai_ray import synth

    d = tmp_path_factory.mktemp("pages_small")
    synth.write_pages(str(d), 800, n_files=4)
    return str(d)


@pytest.fixture(scope="session")
def parsed_small(ray_session, pages_small, tmp_path_factory):
    """One flagship run over pages_small, shared by aggregate tests."""
    from log_analysis_ai_ray.pipelines import flagship

    out = tmp_path_factory.mktemp("flagship_out")
    res = flagship.run(pages_small, str(out))
    res["out_dir"] = str(out)
    res["pages_dir"] = pages_small
    return res


def duckdb_pages(con, pages_dir: str) -> None:
    """Register the pages parquet as a DuckDB view."""
    con.execute(
        f"CREATE OR REPLACE VIEW pages AS "
        f"SELECT * FROM read_parquet('{pages_dir}/*.parquet')"
    )

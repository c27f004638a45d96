"""log_analysis_ai_ray — a Ray-Data-native log/telemetry processing engine.

A from-scratch rebuild of the capabilities of GetSherlog/log-analysis-ai
(reference snapshot at /root/reference, studied read-only) expressed as
idiomatic Ray Data pipelines: ``ray.data.read_parquet`` sources,
vectorized ``map_batches`` over zero-copy Arrow batches, actor pools for
stateful stages, ``groupby``/``sort`` for the wide steps, and
partitioned Parquet fan-out sinks.

Nothing here is a port of the reference's C++ execution engine; the
reference defines WHAT to compute (parser semantics, Drain template
mining, enrichment, aggregate shapes — see SURVEY.md for file:line
citations), and this package re-expresses it Ray-Data-first.
"""

__version__ = "0.1.0"

# Allocator tuning runs in EVERY process that imports this package —
# driver and each Ray worker (stages import the package when their
# UDFs deserialize). See state/malloc_tuning.py for the rationale
# (mmap'd numpy temporaries re-pay first-touch page restore on every
# allocation otherwise).
from .state.malloc_tuning import tune_malloc as _tune_malloc  # noqa: E402

_tune_malloc()


def _assert_pyarrow_agg_ordering() -> None:
    """Guard the keys-first column ordering of pyarrow group_by results.

    Many call sites rename ``TableGroupBy.aggregate`` outputs positionally
    (``.rename_columns([...])``), relying on pyarrow >= 8 returning key
    columns first and aggregate columns after, in declaration order.
    Older pyarrow releases ordered aggregates first, which would silently
    swap column names/types. Fail fast at import instead.
    """
    import pyarrow as _pa

    t = _pa.table({"k": [1, 1], "v": [2.0, 3.0]})
    got = t.group_by("k").aggregate([("v", "sum"), ("v", "count")]).column_names
    if got != ["k", "v_sum", "v_count"]:
        raise ImportError(
            "pyarrow group_by().aggregate() column ordering is not "
            f"keys-first ({got}); positional rename_columns call sites "
            "in this package would mislabel aggregates. Use pyarrow >= 8."
        )


_assert_pyarrow_agg_ordering()

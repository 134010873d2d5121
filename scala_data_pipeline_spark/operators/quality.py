"""Data-quality observation: row counts, null rates and value bounds
piggybacked on a query via ``DataFrame.observe`` — ZERO extra passes
(metrics accumulate inside the same tasks that run the real action).
The operational guardrail for 100 TB jobs, where a separate validation
scan would double the cost.

Batch: pair with ``pyspark.sql.Observation`` and read ``obs.get`` after
the first action. Streaming: the same ``observe`` call surfaces in each
progress event (``StreamingQueryProgress.observedMetrics``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def with_quality_metrics(
    df: DataFrame,
    null_cols: Sequence[str] = (),
    bound_cols: Sequence[str] = (),
) -> tuple[DataFrame, Observation]:
    """Attach row-count, per-column null-count, and min/max metrics.
    Returns (df, observation); read ``observation.get`` after an action
    on the returned frame."""
    obs = Observation()
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in null_cols:
        metrics.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"n_null_{c}")
        )
    for c in bound_cols:
        metrics.append(F.min(c).alias(f"min_{c}"))
        metrics.append(F.max(c).alias(f"max_{c}"))
    return df.observe(obs, *metrics), obs


def assert_quality(
    metrics: dict,
    max_null_rate: float = 1.0,
    bounds: dict[str, tuple[float, float]] | None = None,
) -> list[str]:
    """Evaluate observed metrics against thresholds; returns the list of
    violations (empty = clean). Kept driver-side and pure so jobs can
    raise, log, or route to a dead-letter path as policy dictates."""
    problems = []
    n = metrics.get("n_rows", 0)
    if n == 0:
        return ["empty_input"]
    for k, v in metrics.items():
        if k.startswith("n_null_") and v / n > max_null_rate:
            problems.append(f"{k[7:]}: null rate {v / n:.3f} > {max_null_rate}")
    for col, (lo, hi) in (bounds or {}).items():
        if metrics.get(f"min_{col}") is not None and metrics[f"min_{col}"] < lo:
            problems.append(f"{col}: min {metrics[f'min_{col}']} < {lo}")
        if metrics.get(f"max_{col}") is not None and metrics[f"max_{col}"] > hi:
            problems.append(f"{col}: max {metrics[f'max_{col}']} > {hi}")
    return problems

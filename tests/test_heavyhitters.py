"""SpaceSaving bound tests against exact token counts.

Three published guarantees, each asserted exactly:
- single stream (1 partition): every token with true freq > n/m is
  retained, and est - err <= true <= est for every retained token;
- merged summaries: any token with corpus freq > Σ n_p/m (the
  detection guarantee) appears in the merged output;
- merged counts never exceed true + merged error.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from scala_data_pipeline_spark.ext.heavyhitters import (
    detection_guarantee,
    spacesaving_summaries,
)
from scala_data_pipeline_spark.sources import load_table

SF = "/root/testdata/sf0.001"
M = 64  # small m so eviction actually happens at sf0.001


def _exact_counts(docs) -> dict[str, int]:
    rows = (
        docs.select(
            F.explode(
                F.filter(F.split("text", " "), lambda t: t != "")
            ).alias("token")
        )
        .groupBy("token")
        .count()
        .collect()
    )
    return {r.token: r["count"] for r in rows}


def test_single_stream_bounds(spark):
    docs = load_table(spark, SF, "documents")
    exact = _exact_counts(docs)
    n = sum(exact.values())
    summary = {
        r.token: (r.est, r.err)
        for r in spacesaving_summaries(docs.repartition(1), M).collect()
    }
    assert len(summary) <= M
    threshold = n / M
    for tok, true in exact.items():
        if true > threshold:
            assert tok in summary, (tok, true, threshold)
    for tok, (est, err) in summary.items():
        true = exact.get(tok, 0)
        assert est - err <= true <= est, (tok, est, err, true)


def test_merged_guarantee_and_upper_bound(spark):
    docs = load_table(spark, SF, "documents")
    exact = _exact_counts(docs)
    spread = docs.repartition(8)  # force a real multi-stream merge
    merged = (
        spacesaving_summaries(spread, M)
        .groupBy("token")
        .agg(F.sum("est").alias("est"), F.sum("err").alias("err"))
        .collect()
    )
    got = {r.token: (r.est, r.err) for r in merged}
    n = sum(exact.values())
    g = n / M  # Σ n_p/m telescopes to n/m whatever the row spread
    for tok, true in exact.items():
        if true > g:
            assert tok in got, (tok, true, g)
    for tok, (est, err) in got.items():
        assert est <= exact.get(tok, 0) + err, (tok, est, err)


def test_detection_guarantee_matches_partition_layout(spark):
    g = detection_guarantee(spark, SF, m=M)
    docs = load_table(spark, SF, "documents")
    n = sum(_exact_counts(docs).values())
    # the guarantee sums exactly n/m across partitions
    assert abs(g - n / M) < 1e-9

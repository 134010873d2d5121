"""End-to-end pretraining-recipe job: the invariants each stage
guarantees must survive the composition."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scala_data_pipeline_spark.ext.dedup import lsh_candidate_pairs
from scala_data_pipeline_spark.jobs.recipe_job import recipe
from scala_data_pipeline_spark.sources import load_table


@pytest.fixture(scope="module")
def recipe_out(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    # benchmark = a handful of real docs, so contamination MUST fire
    benchmark = docs.filter(F.col("doc_id") % 101 == 0).select("text")
    pairs = lsh_candidate_pairs(docs).localCheckpoint(eager=True)
    out = recipe(docs, benchmark, pairs, min_calibrated=0.3)
    return docs, out.localCheckpoint(eager=True)


def test_recipe_contamination_and_dedup(spark, recipe_out):
    docs, out = recipe_out
    got = out.collect()
    assert len(got) > 0
    # benchmark members (and their exact/near dups) never survive
    assert all(r.doc_id % 101 != 0 for r in got)
    # survivors are unique docs
    ids = [r.doc_id for r in got]
    assert len(ids) == len(set(ids))
    # weights are positive and bounded by the corpus
    assert all(1 <= r.weight <= docs.count() for r in got)
    # the calibrated gate actually gated
    assert all(r.calibrated_score >= 0.3 for r in got)


def test_recipe_calibrated_gate_is_source_fair(spark, recipe_out):
    """The reason to calibrate BEFORE gating: the bar is the same
    global quantile for every source, so per-source survival rates of
    the quality gate cluster together instead of tracking each
    source's scorer bias. Checked loosely (grain effects + dedup noise
    allowed): no source's survival rate strays more than 0.35 from
    the mean rate."""
    docs, out = recipe_out
    totals = {
        r.source: r["count"]
        for r in docs.groupBy("source").count().collect()
    }
    kept = {
        r.source: r["count"]
        for r in out.groupBy("source").count().collect()
    }
    rates = {s: kept.get(s, 0) / totals[s] for s in totals}
    mean = sum(rates.values()) / len(rates)
    assert all(abs(v - mean) <= 0.35 for v in rates.values()), rates

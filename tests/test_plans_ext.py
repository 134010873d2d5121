"""Plan-shape locks for the session-2 extension operators: the text /
curation / chunking family must stay scan-shaped (no shuffles, no
Python), packing must window within shards (hash exchange, not a global
sort), and fan_out must be a no-op on already-wide inputs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scala_data_pipeline_spark.ext.chunking import chunk_documents, pack_sequences
from scala_data_pipeline_spark.ext.curation import pii_redact, repetition_ratio
from scala_data_pipeline_spark.ext.textstats import token_count
from scala_data_pipeline_spark.ext.util import fan_out
from scala_data_pipeline_spark.plans import plan_audit
from scala_data_pipeline_spark.sources import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_scan_shaped_text_ops(docs):
    """token_count / pii_redact / repetition_ratio / chunk_documents are
    pure per-row work: zero shuffles, zero Python, codegen'd."""
    for name, df in (
        ("token_count", token_count(docs)),
        ("pii_redact", pii_redact(docs)),
        ("repetition_ratio", repetition_ratio(docs)),
        ("chunk_documents", chunk_documents(docs)),
    ):
        a = plan_audit(df)
        assert a["n_shuffle_exchanges"] == 0, name
        assert a["n_python_udfs"] == 0, name
        assert a["codegen_stages"] >= 1, name


def test_pack_sequences_shards_not_global(docs):
    """Packing windows within shards: one hash exchange on the shard
    key, and no global range partitioning (the single-task sort a
    naive global pack would plan)."""
    a = plan_audit(pack_sequences(docs))
    assert a["n_shuffle_exchanges"] == 1
    assert "rangepartitioning" not in a["plan"].lower()
    assert a["n_python_udfs"] == 0


def test_fan_out_noop_when_wide(spark):
    wide = spark.range(0, 1000, 1, spark.sparkContext.defaultParallelism)
    assert fan_out(wide) is wide  # no-op: no extra shuffle at scale
    narrow = spark.range(0, 1000, 1, 1)
    fanned = fan_out(narrow)
    assert fanned is not narrow
    assert (
        fanned.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    )
    # same data either way
    assert fanned.agg(F.sum("id")).first()[0] == 499500


def test_join_hint_strategies(spark, sf_dir):
    """Each join hint reaches its physical operator — the explicit
    strategy-selection surface for when AQE's choice needs overriding."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    cond = orders["o_custkey"] == customer["c_custkey"]
    cases = {
        "BroadcastHashJoin": orders.join(F.broadcast(customer), cond),
        "SortMergeJoin": orders.join(customer.hint("merge"), cond),
        "ShuffledHashJoin": orders.join(customer.hint("shuffle_hash"), cond),
    }
    for op, df in cases.items():
        assert op in plan_audit(df)["plan"], op


def test_tfidf_and_winsorize_broadcast_small_sides(spark, sf_dir):
    """The vocabulary-sized idf frame and the per-group bounds frame
    must broadcast — corpus/fact never shuffles for these joins."""
    from scala_data_pipeline_spark.ext.textstats import tf_idf
    from scala_data_pipeline_spark.queries.stats import winsorize_prices

    a = plan_audit(tf_idf(load_table(spark, sf_dir, "documents")))
    assert a["n_broadcast_joins"] >= 1
    b = plan_audit(winsorize_prices(spark, sf_dir))
    assert b["n_broadcast_joins"] >= 1
    assert b["n_sortmerge_joins"] == 0


def test_scd2_no_cartesian_single_outer_join(spark, sf_dir):
    from scala_data_pipeline_spark.queries.scd_queries import scd2_customer

    a = plan_audit(scd2_customer(spark, sf_dir))
    assert "CartesianProduct" not in a["plan"]
    assert "FullOuter" in a["plan"]


def test_runtime_bloom_filter_join_pruning(spark, sf_dir):
    """Runtime Bloom-filter semi-join pruning: a selective dim-side
    filter injects a bloom_filter_agg on the build side and a
    might_contain predicate into the FACT scan's filter — at 100 TB
    this is the optimizer skipping most of the big-side scan at
    runtime. Locally the application-side scan is far below the 10 GB
    default threshold (that default is tuned for exactly the
    cluster-scale case), so the test lowers it to 0 to demonstrate the
    injection, and disables broadcast to force the SMJ path the filter
    targets."""
    from scala_data_pipeline_spark.plans import explain_str

    keys = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter"
        ".applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {}
    for k, v in keys.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_totalprice") > 500000
        )
        j = (
            li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
            .groupBy("o_orderpriority")
            .count()
        )
        plan = explain_str(j)
        assert "might_contain" in plan
        assert "bloom_filter_agg" in plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_contrastive_hard_negative_cut_is_take_ordered(spark, sf_dir):
    """Round-6 advisor finding: the global hard-negative ranking must
    compile to TakeOrderedAndProject (distributed per-partition top-k),
    not a single-partition sort of the whole <=lo candidate set — on a
    degenerate corpus that set is nearly all candidates."""
    from scala_data_pipeline_spark.ext.dedup import (
        contrastive_triplets,
        lsh_candidate_pairs,
    )
    from scala_data_pipeline_spark.plans.inspect import explain_str

    docs = load_table(spark, sf_dir, "documents")
    plan = explain_str(contrastive_triplets(docs, lsh_candidate_pairs(docs)))
    assert "TakeOrderedAndProject" in plan


def test_runtime_bloom_filter_prunes_shuffle_join(spark, sf_dir):
    """Scale-posture lock (round 9): Spark's runtime bloom-filter join
    pruning must engage for a selective dim-side filter on a shuffle
    join — at 100 TB the fact scan is pre-filtered by a bloom filter
    of the filtered side's join keys BEFORE the shuffle, the Catalyst
    equivalent of a semi-join reducer. The size thresholds are lowered
    here because the test fixture is KBs; at production sizes the
    session defaults engage on their own. If a Spark upgrade or a
    session-conf change silently disables the feature, this fails."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
        == "true"
    )
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "creationSideThreshold",
            "10GB",
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "0",
        )
        # force a shuffle join: broadcast would bypass the bloom path
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = load_table(spark, sf_dir, "lineitem")
        od = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(od, li.l_orderkey == od.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        buf = io.StringIO()
        with redirect_stdout(buf):
            j.explain(mode="formatted")
        plan = buf.getvalue().lower()
        assert "might_contain" in plan, "bloom filter not injected"
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_bloom_prefilter_join_stays_broadcast(spark, sf_dir):
    """Round-15 addition: the explicit bloom-prefilter join must keep
    its scale shape — both k=2 bloom probes are broadcast LEFT SEMI
    joins against the bit table (the probe side is never shuffled for
    them) and nothing in the pipeline is a Python UDF. The exact join
    that removes false positives may be broadcast or shuffle; what is
    locked is that the PREFILTER itself never shuffles lineitem."""
    from scala_data_pipeline_spark.plans import plan_audit
    from scala_data_pipeline_spark.queries.frontier import (
        bloom_prefilter_join,
    )

    a = plan_audit(bloom_prefilter_join(spark, sf_dir))
    plan = a["plan"]
    # Lock ONLY the prefilter invariant: both bloom probes are
    # BROADCAST LeftSemi joins (advisor r15: asserting no SMJ anywhere
    # would fail on a legitimate stats/AQE flip of the downstream
    # exact join, which the docstring explicitly allows either way).
    # Formatted mode: "(N) NodeName" headers, "Join type: LeftSemi" in
    # the detail block — pair them up per node block.
    import re

    blocks = re.split(r"^(?=\(\d+\) )", plan, flags=re.M)
    semi_blocks = [b for b in blocks if "Join type: LeftSemi" in b]
    broadcast_semis = [
        b for b in semi_blocks if b.splitlines()[0].find("Broadcast") >= 0
    ]
    assert len(broadcast_semis) >= 2, (
        f"expected >=2 broadcast LeftSemi prefilter probes, got "
        f"{len(broadcast_semis)} of {len(semi_blocks)} semi joins:\n"
        + "\n".join(b.splitlines()[0] for b in semi_blocks)
    )
    assert a["n_python_udfs"] == 0

"""Property tests for the frontier module (skyline / z-order / DQ).

Oracle parity (tests/test_oracle_parity.py) already proves
engine-equivalence; these tests prove the SEMANTICS independently of
both engines — brute-force dominance for the skyline, bit-exact
de-interleave for the Morton code, and all-green constraints on the
clean generated data.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from scala_data_pipeline_spark.queries.frontier import (
    ZBITS,
    _morton_spark,
    layout_zorder,
    quality_constraints,
    skyline_parts,
)
from scala_data_pipeline_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _dominates(q, p) -> bool:
    return (
        q.p_retailprice <= p.p_retailprice
        and q.p_size >= p.p_size
        and (q.p_retailprice < p.p_retailprice or q.p_size > p.p_size)
    )


def test_skyline_members_exact(spark):
    part = load_table(spark, SF, "part").select(
        "p_brand", "p_partkey", "p_retailprice", "p_size"
    )
    rows = part.collect()  # sf0.001: 200 parts, brute force is fine
    sky = {r.p_partkey for r in skyline_parts(spark, SF).collect()}
    by_brand: dict = {}
    for r in rows:
        by_brand.setdefault(r.p_brand, []).append(r)
    for r in rows:
        dominated = any(_dominates(q, r) for q in by_brand[r.p_brand])
        assert (r.p_partkey in sky) == (not dominated), (
            r,
            r.p_partkey in sky,
        )


def test_morton_deinterleave_roundtrip(spark):
    # 64 (x, y) probes across the 16-bit range, incl. edges
    probes = [(0, 0), (1, 0), (0, 1), (65535, 65535), (43690, 21845)]
    probes += [((37 * i) % 65536, (7919 * i) % 65536) for i in range(59)]
    df = spark.createDataFrame(probes, "x long, y long")
    z = _morton_spark(F.col("x"), F.col("y"))
    # de-interleave: even bits -> x, odd bits -> y
    xs = sum(
        F.shiftleft(
            F.shiftrightunsigned(z, 2 * i).bitwiseAND(F.lit(1)), i
        )
        for i in range(ZBITS)
    )
    ys = sum(
        F.shiftleft(
            F.shiftrightunsigned(z, 2 * i + 1).bitwiseAND(F.lit(1)), i
        )
        for i in range(ZBITS)
    )
    bad = df.select(
        "x", "y", xs.alias("rx"), ys.alias("ry")
    ).where((F.col("x") != F.col("rx")) | (F.col("y") != F.col("ry")))
    assert bad.count() == 0


def test_zorder_buckets_partition_rows(spark):
    stats = layout_zorder(spark, SF).collect()
    orders_n = load_table(spark, SF, "orders").count()
    assert sum(r.n_rows for r in stats) == orders_n
    for r in stats:
        assert r.min_custkey <= r.max_custkey
        assert r.min_day <= r.max_day


def test_skyline_incremental_maintenance(spark):
    """frontier(S ∪ B) == frontier(frontier(S) ∪ B): a maintained
    frontier only ever rescans the stored frontier plus the delta."""
    from pyspark.sql import functions as F

    from scala_data_pipeline_spark.queries.frontier import pareto_frontier

    cols = ["p_brand", "p_partkey", "p_retailprice", "p_size"]
    part = load_table(spark, SF, "part").select(*cols)
    old = part.where(F.col("p_partkey") % 2 == 0)
    batch = part.where(F.col("p_partkey") % 2 != 0)
    full = pareto_frontier(part).select(*cols)
    incremental = pareto_frontier(
        pareto_frontier(old).select(*cols).unionByName(batch)
    ).select(*cols)
    assert full.exceptAll(incremental).count() == 0
    assert incremental.exceptAll(full).count() == 0


def test_constraints_all_pass_on_clean_data(spark):
    rows = quality_constraints(spark, SF).collect()
    assert len(rows) == 7
    assert all(r.passed for r in rows), rows


def test_fingerprint_moves_on_single_row_change(spark):
    from scala_data_pipeline_spark.queries.frontier import table_fingerprint

    base = table_fingerprint(spark, SF).collect()[0]
    # same computation over a copy with ONE row's price shifted a cent
    orders = load_table(spark, SF, "orders")
    drifted = orders.withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") == orders.limit(1).collect()[0].o_orderkey,
            F.col("o_totalprice") + 0.01,
        ).otherwise(F.col("o_totalprice")),
    )
    import scala_data_pipeline_spark.queries.frontier as fr

    ser = F.concat_ws(
        "|",
        *[
            F.coalesce(c, F.lit(fr._NULL_SENTINEL))
            for c in (
                F.col("o_orderkey").cast("string"),
                F.col("o_custkey").cast("string"),
                F.col("o_orderstatus"),
                F.col("o_totalprice").cast("decimal(18,2)").cast("string"),
                F.col("o_orderdate").cast("date").cast("string"),
                F.col("o_orderpriority"),
            )
        ],
    )
    h56 = F.conv(F.substring(F.md5(ser), 1, 14), 16, 10).cast("decimal(38,0)")
    moved = drifted.select(h56.alias("h")).agg(
        F.sum("h").cast("decimal(38,0)").cast("string").alias("fingerprint")
    ).collect()[0]
    assert base.fingerprint != moved.fingerprint

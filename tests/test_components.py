"""Connected components: chains, multiple components, convergence."""

from __future__ import annotations

from scala_data_pipeline_spark.ext.components import connected_components


def test_components_chain_and_islands(spark):
    # chain 1-2-3 ... 9-1 merges {1,2,3,8,9}; {5,6} separate.
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (8, 9), (9, 1)], ["doc_a", "doc_b"]
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 8: 1, 9: 1, 5: 5, 6: 5}


def test_components_long_chain_converges(spark):
    # path graph 0-1-2-...-12: diameter > a couple rounds, still converges
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], ["doc_a", "doc_b"]
    )
    got = connected_components(pairs).collect()
    assert {r["cluster_id"] for r in got} == {0}
    assert len(got) == 13

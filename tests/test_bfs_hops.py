"""BFS hop distance (ext/graph.py::bfs_hops): exact hop values on a
hand-built graph, the max_hops bound, isolated seeds, multi-seed min."""

from __future__ import annotations

from scala_data_pipeline_spark.ext.graph import bfs_hops


def _run(spark, edges, seeds, max_hops=6):
    pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    s = spark.createDataFrame([(x,) for x in seeds], ["doc_id"])
    return {r.doc_id: r.hops for r in bfs_hops(pairs, s, max_hops).collect()}


def test_path_distances(spark):
    # 1-2-3-4-5 path, seed 1
    edges = [(1, 2), (2, 3), (3, 4), (4, 5)]
    assert _run(spark, edges, [1]) == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}


def test_max_hops_bound(spark):
    edges = [(1, 2), (2, 3), (3, 4), (4, 5)]
    out = _run(spark, edges, [1], max_hops=2)
    assert out == {1: 0, 2: 1, 3: 2}  # 4 and 5 unreached within bound


def test_multi_seed_takes_min(spark):
    # seeds at both ends of the path: middle vertex is 2 from either
    edges = [(1, 2), (2, 3), (3, 4), (4, 5)]
    assert _run(spark, edges, [1, 5]) == {1: 0, 2: 1, 3: 2, 4: 1, 5: 0}


def test_isolated_seed_and_unreached_component(spark):
    # seed 10 has no edges; component {7,8} is never reached
    edges = [(1, 2), (7, 8)]
    out = _run(spark, edges, [10, 1])
    assert out == {10: 0, 1: 0, 2: 1}

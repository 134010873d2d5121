"""Personalized PageRank (ext/graph.py::personalized_pagerank):
restart-mass locality on a hand-built graph plus the empty-seed and
outside-graph-seed contracts."""

from __future__ import annotations

from scala_data_pipeline_spark.ext.graph import personalized_pagerank


def _run(spark, edges, seeds, **kw):
    pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    s = spark.createDataFrame([(x,) for x in seeds], ["doc_id"])
    return {r.doc_id: r for r in personalized_pagerank(pairs, s, **kw).collect()}


def test_rank_decays_with_distance_from_seed(spark):
    # path 1-2-3-4-5, seed 1: rank must strictly decrease along it
    edges = [(1, 2), (2, 3), (3, 4), (4, 5)]
    out = _run(spark, edges, [1])
    ranks = [out[v].rank for v in (1, 2, 3, 4, 5)]
    assert all(a > b for a, b in zip(ranks, ranks[1:])), ranks
    assert out[1].is_seed and not out[2].is_seed


def test_total_mass_bounded_by_one(spark):
    edges = [(1, 2), (2, 3), (1, 3), (3, 4)]
    out = _run(spark, edges, [1, 2])
    total = sum(r.rank for r in out.values())
    # truncated power iteration: mass <= 1, and well above 0
    assert 0.1 < total <= 1.0 + 1e-9


def test_seed_outside_graph_is_dropped(spark):
    edges = [(1, 2)]
    out = _run(spark, edges, [99])  # 99 has no edges
    assert out == {}  # no surviving seeds -> empty result frame


def test_uniform_seeds_reduce_to_symmetry(spark):
    # triangle with all vertices seeded: symmetry forces equal ranks
    edges = [(1, 2), (2, 3), (1, 3)]
    out = _run(spark, edges, [1, 2, 3])
    ranks = {r.rank for r in out.values()}
    assert len(ranks) == 1

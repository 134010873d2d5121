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
    # path graph 0-1-2-...-12: diameter > a couple rounds, still
    # converges. small_graph_bound=0 forces the ITERATIVE path (the
    # default would take the single-pass small-graph solve).
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], ["doc_a", "doc_b"]
    )
    got = connected_components(pairs, small_graph_bound=0).collect()
    assert {r["cluster_id"] for r in got} == {0}
    assert len(got) == 13


def test_components_unconverged_raises_and_warn_mode(spark):
    import warnings

    import pytest

    from scala_data_pipeline_spark.ext.components import ComponentsNotConverged

    # path graph 0-1-...-8 has diameter 8; 2 rounds cannot reach fixpoint
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], ["doc_a", "doc_b"]
    )
    with pytest.raises(ComponentsNotConverged):
        connected_components(pairs, max_iter=2, small_graph_bound=0)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        got = connected_components(
            pairs, max_iter=2, on_unconverged="warn", small_graph_bound=0
        )
        assert len(got.collect()) == 9  # partial labels still returned
    assert any("no fixpoint" in str(w.message) for w in caught)


def _union_find_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical: min id per component
    return {v: find(v) for v in list(parent)}


def test_components_random_graphs_match_union_find(spark):
    """Property check against a pure-Python union-find on a batch of
    random graphs (seeded; one Spark run per graph shape)."""
    import random

    rng = random.Random(7)
    for trial in range(4):
        n = rng.randint(2, 40)
        m = rng.randint(1, 60)
        edges = [
            (rng.randint(0, n), rng.randint(0, n)) for _ in range(m)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        want = _union_find_components(edges)
        pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
        # Both paths must agree with the reference union-find: the
        # default (small-graph single-pass solve) and the forced
        # iterative propagation.
        for bound in (None, 0):
            kwargs = {} if bound is None else {"small_graph_bound": 0}
            got = {
                r["doc_id"]: r["cluster_id"]
                for r in connected_components(pairs, **kwargs).collect()
            }
            assert got == want, f"trial {trial} bound={bound}: {sorted(edges)}"


def test_star_components_long_chain_logarithmic(spark):
    """large-star/small-star resolves a diameter-30 path in far fewer
    rounds than the diameter (the O(log n) claim): max_iter=12 would
    fail propagation but must succeed here."""
    from scala_data_pipeline_spark.ext.components import (
        connected_components_star,
    )

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], ["doc_a", "doc_b"]
    )
    # small_graph_bound=0 forces star contraction (the default would
    # dispatch this tiny graph to the single-pass driver solve).
    got = connected_components_star(
        pairs, max_iter=12, small_graph_bound=0
    ).collect()
    assert {r["cluster_id"] for r in got} == {0}
    assert len(got) == 31


def test_star_components_random_graphs_match_union_find(spark):
    from scala_data_pipeline_spark.ext.components import (
        connected_components_star,
    )
    import random

    rng = random.Random(11)
    for trial in range(4):
        n = rng.randint(2, 40)
        m = rng.randint(1, 60)
        edges = [
            (rng.randint(0, n), rng.randint(0, n)) for _ in range(m)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        want = _union_find_components(edges)
        pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
        # Both paths must agree with the reference union-find: the
        # default (small-graph single-pass solve, r19) and the forced
        # star contraction.
        for bound in (None, 0):
            kwargs = {} if bound is None else {"small_graph_bound": 0}
            got = {
                r["doc_id"]: r["cluster_id"]
                for r in connected_components_star(pairs, **kwargs).collect()
            }
            assert got == want, f"trial {trial} bound={bound}: {sorted(edges)}"


def test_star_components_self_loop_only_vertices_labeled(spark):
    # ADVICE r3: a vertex appearing ONLY in self-pairs must still be
    # labeled with its own id, matching the propagation variant and the
    # recursive-CTE oracle.
    from scala_data_pipeline_spark.ext.components import (
        connected_components_star,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (7, 7), (9, 9)], ["doc_a", "doc_b"]
    )
    # Self-loop handling must hold on BOTH star paths (driver dispatch
    # and forced contraction) and match the propagation variant.
    for bound in (None, 0):
        kwargs = {} if bound is None else {"small_graph_bound": 0}
        star = {
            r["doc_id"]: r["cluster_id"]
            for r in connected_components_star(pairs, **kwargs).collect()
        }
        assert star == {1: 1, 2: 1, 7: 7, 9: 9}, f"bound={bound}"
    prop = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(pairs).collect()
    }
    assert star == prop


def test_star_components_above_bound_reuses_bi_and_matches(spark):
    """small_graph_bound EXCEEDED: the star path must run off the
    already-persisted bidirectional frame (r19 advisor: the old code
    unpersisted it and re-derived the pair pipeline from scratch) and
    still produce union-find-identical labels — including self-loop-only
    vertices, which only survive via the bi-derived vertex set."""
    from scala_data_pipeline_spark.ext.components import (
        connected_components_star,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (7, 7)], ["doc_a", "doc_b"]
    )
    # 3 undirected non-loop edges -> 6 bidirectional + 1 self row = 7
    # distinct bi rows > bound, forcing the star path through bi.
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components_star(
            pairs, small_graph_bound=2
        ).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 7: 7}

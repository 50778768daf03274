"""Connected components (functions.components): pair list → duplicate
clusters with min-doc_id canonical labels."""

from __future__ import annotations

import pytest

from bearysta_spark.functions.components import cluster_sizes, connected_components


def _labels(spark, edges):
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = connected_components(df)
    return {r["node"]: r["component"] for r in got.collect()}


def test_two_components(spark):
    got = _labels(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_chain_needs_multiple_iterations(spark):
    # Diameter-5 path: the min label must propagate hop by hop.
    got = _labels(spark, [(5, 6), (4, 5), (3, 4), (2, 3), (1, 2)])
    assert got == {i: 1 for i in range(1, 7)}


def test_direction_and_duplicates_irrelevant(spark):
    got = _labels(spark, [(9, 2), (2, 9), (9, 2), (7, 9)])
    assert got == {2: 2, 7: 2, 9: 2}


def test_empty_edges(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(df).count() == 0


def test_cluster_sizes(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"])
    got = {
        r["component"]: r["n_docs"]
        for r in cluster_sizes(connected_components(df)).collect()
    }
    assert got == {1: 3, 10: 2}


def test_unconverged_raises(spark):
    # a 12-node path needs ~11 min-label rounds; cap at 2 → must raise,
    # not silently return split components (ADVICE r01)
    import pytest as _pytest

    from bearysta_spark.functions.components import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "id_a: long, id_b: long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=2)


# ---------------------------------------------------------------------------
# Large-star/small-star variant (web-scale form)
# ---------------------------------------------------------------------------


def _labels_star(spark, edges, **kw):
    from bearysta_spark.functions.components import connected_components_star

    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = connected_components_star(df, **kw)
    return {r["node"]: r["component"] for r in got.collect()}


def test_star_two_components(spark):
    got = _labels_star(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_star_deep_path_converges_fast(spark):
    # a 16-node path has diameter 15; the alternation must finish in
    # O(log^2 n) rounds — well under the 10-round cap that would choke
    # min-label propagation
    edges = [(i, i + 1) for i in range(15)]
    got = _labels_star(spark, edges, max_iter=10)
    assert got == {i: 0 for i in range(16)}


def test_star_empty(spark):
    from bearysta_spark.functions.components import connected_components_star

    df = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components_star(df).count() == 0


# r14: 40 random graphs x 2 iterative CC runs ~= 23 s of the quiet
# suite; property coverage, deselected by default with the other
# slow tests (run with -m slow). The deterministic CC tests above
# stay in the default gate.
@pytest.mark.slow
def test_star_matches_min_label_random_graphs(spark):
    # deterministic pseudo-random multigraphs: both algorithms must
    # produce identical (node -> component-min) labelings
    import random

    rnd = random.Random(1234)
    for trial in range(6):
        n = rnd.randint(2, 40)
        m = rnd.randint(1, 70)
        edges = [
            (rnd.randrange(n), rnd.randrange(n)) for _ in range(m)
        ]
        edges = [e for e in edges if e[0] != e[1]] or [(0, 1)]
        df = spark.createDataFrame(edges, ["id_a", "id_b"])
        a = {
            r["node"]: r["component"]
            for r in connected_components(df, max_iter=50).collect()
        }
        b = _labels_star(spark, edges)
        assert a == b, f"trial {trial}: {sorted(a.items())} != {sorted(b.items())}"

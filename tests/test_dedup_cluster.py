"""Connected-components dedup clustering: distributed min-label propagation
(functions/dedup.connected_components) + keep-one-per-cluster selection."""

import pytest
from pyspark.sql import functions as F

from datax_spark.functions import dedup as DD


def _pairs(spark, edges):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "a long, b long"
    )


def _comp(spark, edges):
    return {
        r.id: r.component
        for r in DD.connected_components(_pairs(spark, edges)).collect()
    }


def test_two_clusters_and_chain(spark):
    # {1,2,3} triangle-ish, {10,11}, and a chain 20-21-22-23 (diameter 3)
    got = _comp(spark, [(2, 1), (2, 3), (10, 11), (20, 21), (21, 22),
                        (22, 23)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20, 23: 20}


def test_long_chain_converges(spark):
    # 40-node chain: worst case for plain propagation (O(diameter) iters)
    edges = [(i, i + 1) for i in range(100, 140)]
    got = _comp(spark, edges)
    assert set(got.values()) == {100}
    assert len(got) == 41


def test_partitioning_independence(spark):
    edges = [(5, 3), (3, 9), (100, 50), (7, 7)]  # self-loop dropped
    a = _comp(spark, edges)
    b = {
        r.id: r.component
        for r in DD.connected_components(
            _pairs(spark, edges).repartition(13)
        ).collect()
    }
    assert a == b == {3: 3, 5: 3, 9: 3, 50: 50, 100: 50}


def test_max_iters_raises(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        DD.connected_components(
            _pairs(spark, [(i, i + 1) for i in range(10)]), max_iters=2
        )


def test_keep_one_selection_and_provenance(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in (1, 2, 3, 10, 11, 99)],
        "doc_id long, text string",
    )
    out = DD.dedup_keep_one(docs, _pairs(spark, [(2, 1), (2, 3), (10, 11)]))
    rows = {r.doc_id: (r.component, r.n_dups, r.text) for r in out.collect()}
    # one survivor per cluster (min id), singletons untouched
    assert set(rows) == {1, 10, 99}
    assert rows[1] == (1, 3, "text 1")
    assert rows[10] == (10, 2, "text 10")
    assert rows[99] == (99, 1, "text 99")

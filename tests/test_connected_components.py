"""Connected components / dedup groups (operators/dedup.py): min-label
propagation with pointer jumping vs a brute-force union-find, including a
worst-case chain (where naive one-hop propagation needs O(n) rounds but
pointer jumping needs O(log n))."""

import numpy as np
import pytest

from light_curve_python_spark.operators.dedup import (
    connected_components,
    dedup_groups,
)


def _uf(n, edges):
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in range(n)}


def test_components_match_union_find(spark):
    rng = np.random.default_rng(0)
    n = 400
    edges = [(int(a), int(b)) for a, b in rng.integers(0, n, (300, 2))
             if a != b]
    edges += [(i, i + 1) for i in range(300, 399)]   # 100-node chain
    want = _uf(n, edges)
    pairs = spark.createDataFrame(edges, "id_a int, id_b int")
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id int")
    got = {r["id"]: r["component"]
           for r in connected_components(pairs, nodes=nodes,
                                         node_col="doc_id").collect()}
    assert len(got) == n
    assert got == want
    # union-find with min-merge roots == min id per component
    assert all(got[i] <= i for i in range(n))


def test_dedup_groups_canonicals(spark):
    pairs = spark.createDataFrame(
        [("b", "c"), ("c", "d"), ("x", "y")], "id_a string, id_b string")
    nodes = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",), ("x",), ("y",), ("z",)],
        "doc_id string")
    g = dedup_groups(pairs, nodes, "doc_id").toPandas() \
        .set_index("id").sort_index()
    assert g.loc["a", "component"] == "a"      # singleton keeps itself
    assert g.loc["d", "component"] == "b"      # transitively grouped
    assert g.loc["y", "component"] == "x"
    assert set(g[g.is_canonical].index) == {"a", "b", "x", "z"}


def test_components_without_nodes_covers_paired_only(spark):
    pairs = spark.createDataFrame([(7, 3)], "id_a int, id_b int")
    out = connected_components(pairs).toPandas().set_index("id")
    assert set(out.index) == {3, 7}
    assert (out["component"] == 3).all()


def test_components_nonconvergence_raises(spark):
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "id_a int, id_b int")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=2)

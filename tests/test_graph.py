"""Connected components (operators/graph.py) vs a pure-Python union-find."""
from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from zacks_estimates_financial_statements_spark.operators import graph


def _uf_labels(edges):
    """Min-id component label per touched node, via union-find."""
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
    touched = {n for e in edges for n in e}
    return {n: find(n) for n in touched}


def _spark_labels(spark, edges):
    df = spark.createDataFrame(edges, "id_a: long, id_b: long")
    # r12 tier parity: the size-gated driver union-find (default — these
    # graphs are tiny) and the distributed large-star/small-star loop
    # (forced via max_local_edges=0) must label identically
    local = {r["node"]: r["component"]
             for r in graph.connected_components(df).collect()}
    dist = {r["node"]: r["component"]
            for r in graph.connected_components(
                df, max_local_edges=0).collect()}
    assert local == dist
    return local


def test_matches_union_find_on_random_graphs(spark):
    rng = random.Random(11)
    for _ in range(3):
        n = 80
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(60)]
        edges = [e for e in edges if e[0] != e[1]]
        assert _spark_labels(spark, edges) == _uf_labels(edges)


def test_long_path_worst_case_diameter(spark):
    # A 30-node path exercises the O(log n)-round convergence; naive
    # 1-hop label propagation would need ~30 rounds.
    edges = list(zip(range(100, 129), range(101, 130)))
    labels = _spark_labels(spark, edges)
    assert set(labels.values()) == {100}
    assert len(labels) == 30


def test_duplicate_and_reversed_edges_collapse(spark):
    edges = [(2, 1), (1, 2), (2, 1), (3, 3), (3, 4)]
    labels = _spark_labels(spark, edges)
    # self-loop (3,3) contributes nothing on its own; (3,4) links it
    assert labels == {1: 1, 2: 1, 3: 3, 4: 3}


def test_nonconvergence_raises(spark):
    df = spark.createDataFrame([(1, 2), (2, 3)], "id_a: long, id_b: long")
    with pytest.raises(RuntimeError, match="did not converge"):
        # max_local_edges=0 forces the distributed loop (the driver
        # tier has no iteration budget to exhaust)
        graph.connected_components(df, max_iter=0, max_local_edges=0)


def test_resolve_duplicate_clusters_marks_one_keeper(spark):
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(7)], "doc_id: long, text: string")
    pairs = spark.createDataFrame(
        [(0, 3), (3, 5), (2, 6)], "id_a: long, id_b: long")
    out = graph.resolve_duplicate_clusters(docs, pairs, "doc_id")
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[0]["component"] == 0 and rows[3]["component"] == 0 \
        and rows[5]["component"] == 0
    assert rows[0]["cluster_size"] == 3 and not rows[3]["keep"]
    assert rows[2]["component"] == 2 and rows[6]["cluster_size"] == 2
    # singletons keep themselves
    assert rows[1]["keep"] and rows[1]["cluster_size"] == 1
    kept = [r for r in rows.values() if r["keep"]]
    assert len(kept) == 4  # {0,3,5}, {2,6}, {1}, {4}
    # dedup decision: exactly one keeper per component
    per_comp = (out.groupBy("component")
                .agg(F.sum(F.col("keep").cast("int")).alias("k")).collect())
    assert all(r["k"] == 1 for r in per_comp)


def test_stress_20k_nodes_logarithmic_rounds(spark):
    """Scale-shape evidence: a 20k-node graph (random edges + an
    adversarial 2k-node path) resolves in O(log n) alternation rounds
    with labels identical to union-find."""
    rng = random.Random(3)
    n = 20_000
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(15_000)]
    path_lo = 17_000
    edges += list(zip(range(path_lo, n - 1), range(path_lo + 1, n)))
    edges = [e for e in edges if e[0] != e[1]]

    rounds = {"n": 0}
    orig = graph._small_star

    def counting(e):
        rounds["n"] += 1
        return orig(e)

    graph._small_star = counting
    try:
        got = _spark_labels(spark, edges)
    finally:
        graph._small_star = orig
    assert got == _uf_labels(edges)
    assert rounds["n"] <= 10  # log-ish, NOT diameter-bound (path is 3k long)


def test_reliable_checkpoint_branch(spark, tmp_path):
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    df = spark.createDataFrame([(1, 2), (2, 3), (7, 8)],
                               "id_a: long, id_b: long")
    got = {r["node"]: r["component"]
           for r in graph.connected_components(df, reliable=True).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}


def test_pagerank_ring_uniform(spark):
    """A directed ring is perfectly symmetric: every node keeps exactly
    the uniform rank at every iteration."""
    from zacks_estimates_financial_statements_spark.operators import graph as G

    e = spark.createDataFrame(
        [(i, (i + 1) % 5) for i in range(5)], "src long, dst long")
    got = {r["node"]: r["rank"] for r in G.pagerank(e, n_iter=3).collect()}
    assert set(got) == set(range(5))
    assert all(v == 0.2 for v in got.values())


def test_pagerank_dangling_mass_conserved(spark):
    """A sink node (no out-edges) must not leak rank: total stays ~1,
    and the hub pointed to by everyone outranks the spokes."""
    from zacks_estimates_financial_statements_spark.operators import graph as G

    # spokes 1..4 -> hub 0; hub is dangling
    e = spark.createDataFrame(
        [(i, 0) for i in range(1, 5)], "src long, dst long")
    got = {r["node"]: r["rank"] for r in G.pagerank(e, n_iter=5).collect()}
    assert abs(sum(got.values()) - 1.0) < 1e-4
    assert got[0] > got[1] and len(got) == 5
    assert len({got[i] for i in range(1, 5)}) == 1  # spokes symmetric


def test_incremental_components_equal_full_recompute(spark):
    """Labels maintained incrementally over a batch (contracted-graph
    CC + relabel map) must equal a full CC over the union graph —
    including multi-component merges, fresh-node-only clusters, and a
    new node becoming the new minimum of an old cluster."""
    import random

    from pyspark.sql import functions as F

    from zacks_estimates_financial_statements_spark.operators import graph as G

    rng = random.Random(7)
    nodes_old = list(range(100, 160))
    old_edges = [(rng.choice(nodes_old), rng.choice(nodes_old))
                 for _ in range(70)]
    nodes_new = list(range(0, 40))
    new_edges = ([(rng.choice(nodes_new), rng.choice(nodes_new))
                  for _ in range(30)]          # batch-internal
                 + [(rng.choice(nodes_new), rng.choice(nodes_old))
                    for _ in range(12)])       # batch-to-corpus merges

    oe = spark.createDataFrame([e for e in old_edges if e[0] != e[1]],
                               "id_a long, id_b long")
    ne = spark.createDataFrame([e for e in new_edges if e[0] != e[1]],
                               "id_a long, id_b long")

    # stored labels: full vertex set of the old graph (isolated -> self)
    cc_old = G.connected_components(oe)
    base = spark.createDataFrame([(n,) for n in nodes_old], "node long")
    labels = (base.join(cc_old, "node", "left")
              .select("node", F.coalesce("component", "node")
                      .alias("component")))

    batch_labels, relabel = G.incremental_components(labels, ne)
    merged = G.apply_relabel(labels, relabel)
    batch_all = spark.createDataFrame([(n,) for n in nodes_new],
                                      "node long") \
        .join(batch_labels, "node", "left") \
        .select("node", F.coalesce("component", "node").alias("component"))
    incremental = {(r["node"], r["component"])
                   for r in merged.union(batch_all).collect()}

    # ground truth: one CC over everything
    full = G.connected_components(oe.union(ne))
    base_all = spark.createDataFrame(
        [(n,) for n in nodes_old + nodes_new], "node long")
    truth = {(r["node"], r["component"]) for r in
             (base_all.join(full, "node", "left")
              .select("node", F.coalesce("component", "node")
                      .alias("component"))).collect()}
    assert incremental == truth
    # the batch really did merge old components / take over minimums
    assert relabel.count() > 0


# ---------------------------------------------------------- label propagation

def test_label_propagation_two_communities(spark):
    # two triangles bridged by one edge: LPA separates them where
    # connected_components sees a single component
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        "src bigint, dst bigint")
    out = {r["node"]: r["label"] for r in graph.label_propagation(
        edges, n_iter=4).collect()}
    assert len({out[1], out[2], out[3]}) == 1
    assert len({out[4], out[5], out[6]}) == 1
    assert out[1] != out[4]
    comps = {r["node"]: r["component"] for r in
             graph.connected_components(edges, src="src",
                                        dst="dst").collect()}
    assert len(set(comps.values())) == 1       # CC: one blob


def test_label_propagation_deterministic_and_ignores_self_loops(spark):
    edges = spark.createDataFrame(
        [(i % 7, (i * 3 + 1) % 7) for i in range(30)] + [(2, 2)],
        "src bigint, dst bigint")
    a = sorted(map(tuple, graph.label_propagation(edges, n_iter=3)
                   .collect()))
    b = sorted(map(tuple, graph.label_propagation(
        edges.repartition(5), n_iter=3).collect()))
    assert a == b and len(a) > 0
    # min-label tie-break: labels are drawn from node ids
    assert all(lbl in {n for n, _ in a} for _, lbl in a)


def test_label_propagation_string_node_ids(spark):
    # the advertised use: host/URL graphs with STRING ids — the
    # tie-break must not negate the label column (ANSI would throw).
    edges = spark.createDataFrame(
        [("a.com", "b.com"), ("b.com", "c.com"), ("a.com", "c.com"),
         ("x.org", "y.org"), ("y.org", "z.org"), ("x.org", "z.org")],
        "src string, dst string")
    out = {r["node"]: r["label"] for r in graph.label_propagation(
        edges, n_iter=3).collect()}
    assert len({out["a.com"], out["b.com"], out["c.com"]}) == 1
    assert len({out["x.org"], out["y.org"], out["z.org"]}) == 1
    assert out["a.com"] != out["x.org"]
    # smallest-label convention holds for strings too
    assert out["x.org"] == "x.org" and out["a.com"] == "a.com"

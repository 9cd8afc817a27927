"""PageRank kernel: planted-graph exactness against a pure-Python fold of
the same integer recurrence, plus invariants of the nation-trade query."""

from pyspark.sql import functions as F

from sap_sql_engine_spark.operators import graph


def _py_pagerank(nodes, edges, iterations, n_teleport):
    """Reference fold of the exact integer recurrence (floor division)."""
    base = graph.PR_SCALE // n_teleport
    out_w = {}
    for s, _, w in edges:
        out_w[s] = out_w.get(s, 0) + w
    pr = {v: base for v in nodes}
    for _ in range(iterations):
        incoming = {v: 0 for v in nodes}
        for s, d, w in edges:
            incoming[d] += pr[s] * w // out_w[s]
        pr = {
            v: ((100 - graph.PR_DAMP_NUM) * base + graph.PR_DAMP_NUM * incoming[v]) // 100
            for v in nodes
        }
    return pr


def test_pagerank_loop_matches_reference_fold(spark):
    nodes = [0, 1, 2, 3]
    # asymmetric weighted graph with a dangling node (3) and a sink-ish hub
    edges = [(0, 1, 3), (0, 2, 1), (1, 2, 5), (2, 0, 2), (2, 1, 2)]
    ndf = spark.createDataFrame([(n,) for n in nodes], ["node"])
    edf = spark.createDataFrame(edges, ["src", "dst", "w"])
    got = {
        r.node: r.pr
        for r in graph.pagerank_loop(ndf, edf, 3, len(nodes)).collect()
    }
    assert got == _py_pagerank(nodes, edges, 3, len(nodes))
    # hub (node 1,2) outranks the dangling node
    assert got[2] > got[3] and got[1] > got[3]


def test_nation_pagerank_invariants(spark, sf_dir):
    rows = graph.q_nation_trade_pagerank(spark, sf_dir).collect()
    assert len(rows) == graph.PR_N_NATIONS
    # sorted by rank desc (tie: name)
    prs = [r.pagerank_micro for r in rows]
    assert prs == sorted(prs, reverse=True)
    # every nation trades, so mass is ~conserved (floor residue only)
    total = sum(prs)
    assert 0.95 * graph.PR_SCALE <= total <= graph.PR_SCALE
    for r in rows:
        assert r.pagerank_micro > 0
        assert abs(r.pagerank - r.pagerank_micro / graph.PR_SCALE) < 1e-8


def _tri_report(spark, edges):
    df = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "p1 long, p2 long"
    ).distinct()
    return graph.triangle_report(df).collect()[0]


def test_triangle_kernel_planted_graphs(spark):
    # K4: 4 triangles, 4 nodes, 6 edges, wedges = 4*C(3,2) = 12,
    # clustering = 3*4/12 = 1.0
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    r = _tri_report(spark, k4)
    assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == (4, 6, 12, 4)
    assert r.clustering_micro == 1_000_000

    # path 0-1-2-3: no triangles, 2 open wedges, clustering 0
    r = _tri_report(spark, [(0, 1), (1, 2), (2, 3)])
    assert (r.n_triangles, r.n_wedges, r.clustering_micro) == (0, 2, 0)

    # two triangles sharing an edge (bowtie-ish): 0-1-2 and 1-2-3
    r = _tri_report(spark, [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)])
    assert r.n_triangles == 2
    # degree-skew star + one closing edge: hub 0 to 1..5, edge (1, 2)
    r = _tri_report(spark, [(0, i) for i in range(1, 6)] + [(1, 2)])
    assert r.n_triangles == 1 and r.n_edges == 6

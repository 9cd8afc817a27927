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

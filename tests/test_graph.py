"""Link-graph analytics (operators/graph.py): degrees + replayable
iterative PageRank."""

from __future__ import annotations

import pytest

from raven_spark.operators.graph import degrees, pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src bigint, dst bigint")


def test_degrees_full_outer_union_of_endpoints(spark):
    e = _edges(spark, [(1, 2), (1, 3), (2, 3)])
    d = {r["node"]: (r["outdeg"], r["indeg"]) for r in degrees(e).collect()}
    assert d == {1: (2, 0), 2: (1, 1), 3: (0, 2)}


def test_pagerank_cycle_is_uniform_fixed_point(spark):
    # a directed 4-cycle: the uniform vector is exactly stationary, so
    # every iteration count must return 1/4 per node
    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    for iters in (1, 5):
        pr = {r["node"]: r["pagerank"] for r in pagerank(e, iterations=iters).collect()}
        assert pr == {0: 0.25, 1: 0.25, 2: 0.25, 3: 0.25}


def test_pagerank_sink_attracts_mass(spark):
    # 0->2, 1->2, 2->0: node 2 has the only in-degree 2; its rank must
    # exceed the uniform 1/3 after one step and keep growing relative
    e = _edges(spark, [(0, 2), (1, 2), (2, 0)])
    pr = {r["node"]: r["pagerank"] for r in pagerank(e, iterations=3).collect()}
    assert pr[2] > pr[0] > pr[1]
    # hand-replay of the documented recurrence, one step:
    # p0 = 1/3; p1(2) = round(0.05 + 0.85*(1/3 + 1/3), 12)
    one = {r["node"]: r["pagerank"] for r in pagerank(e, iterations=1).collect()}
    assert one[2] == pytest.approx(round(0.15 / 3 + 0.85 * (2 / 3), 6), abs=1e-9)


def test_pagerank_dangling_mass_leaks_documented(spark):
    # 0->1 with node 1 dangling: the module docstring documents NO
    # dangling redistribution, so total mass drops below 1
    e = _edges(spark, [(0, 1)])
    pr = pagerank(e, iterations=2).collect()
    assert sum(r["pagerank"] for r in pr) < 1.0


def test_pagerank_partition_invariant(spark):
    pairs = [(i, (i * 7 + 3) % 50) for i in range(50) if (i * 7 + 3) % 50 != i]
    a = pagerank(_edges(spark, pairs), iterations=4, checkpoint_every=2)
    b = pagerank(_edges(spark, pairs).repartition(13), iterations=4, checkpoint_every=3)
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_anchor_texts_extraction(spark):
    from raven_spark.operators.graph import anchor_texts

    html = (
        '<p>intro</p><a href="https://t.example/a">Visit  the\npage</a>'
        "<a href='https://t.example/b'><b>Read</b> more <i>now</i></a>"
        '<a class="x" href="https://t.example/c"></a>'
        '<a name="no-href-anchor">not a link</a>'
        '<a data-href="https://wrong.example/">only data-href</a>'
    )
    df = spark.createDataFrame([("https://s.example/", html)],
                               "url string, html string")
    rows = {r["href"]: r["anchor_text"] for r in anchor_texts(df).collect()}
    assert rows["https://t.example/a"] == "Visit the page"  # ws collapsed
    assert rows["https://t.example/b"] == "Read more now"   # tags stripped
    assert rows["https://t.example/c"] == ""                # empty anchor kept
    assert len(rows) == 3                                   # no-href skipped


def test_anchor_profile_topk(spark):
    from raven_spark.operators.graph import anchor_profile, anchor_texts

    pages = [
        ("https://s1.example/", '<a href="https://t.example/x">great spark guide</a>'),
        ("https://s2.example/", '<a href="https://t.example/x">spark tutorial</a>'),
        ("https://s2.example/", '<a href="https://t.example/x">spark</a>'),
        ("https://s3.example/", '<a href="https://t.example/y">unrelated words</a>'),
    ]
    df = spark.createDataFrame(pages, "url string, html string")
    prof = anchor_profile(anchor_texts(df), k=2)
    x = {r["rank"]: r for r in prof.filter("href = 'https://t.example/x'").collect()}
    assert x[1]["term"] == "spark" and x[1]["term_count"] == 3
    assert x[1]["n_anchors"] == 3 and x[1]["n_sources"] == 2
    assert x[2]["term_count"] == 1  # tie among guide/great/tutorial -> asc
    assert x[2]["term"] == "great"


def test_hits_star_graph(spark):
    """One hub pointing at 3 authorities (star): the hub gets all hub
    mass, the authorities split authority mass equally; a fixed point
    from iteration 1, so 1 and 4 iterations agree."""
    from raven_spark.operators.graph import hits

    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "src long, dst long"
    )
    out = {r["node"]: r for r in hits(edges, iterations=2).collect()}
    assert out[0]["hub"] == 1.0 and out[0]["authority"] == 0.0
    for v in (1, 2, 3):
        assert abs(out[v]["authority"] - 1 / 3) < 1e-6
        assert out[v]["hub"] == 0.0
    again = {r["node"]: (r["authority"], r["hub"])
             for r in hits(edges, iterations=4).collect()}
    assert again == {k: (v["authority"], v["hub"]) for k, v in out.items()}


def test_hits_partition_invariance(spark):
    from pyspark.sql import functions as F

    from raven_spark.operators.graph import hits

    edges = spark.range(0, 300).select(
        F.col("id").alias("src"),
        F.pmod(F.col("id") * 17 + 31, F.lit(100)).alias("dst"),
    ).filter("src != dst")
    a = sorted(map(tuple, hits(edges, iterations=3).collect()))
    b = sorted(map(tuple, hits(edges.repartition(11), iterations=3).collect()))
    assert a == b


def test_connected_components_two_chains_and_isolate(spark):
    from raven_spark.operators.graph import connected_components

    # component {0,1,2,3} (path), component {10,11} plus a cross edge
    # 11-3 merging them, component {20,21}, isolated node 30
    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (10, 11), (11, 3), (20, 21)])
    nodes = spark.createDataFrame([(i,) for i in [0, 1, 2, 3, 10, 11, 20, 21, 30]], "node bigint")
    got = {r["node"]: r["component"] for r in connected_components(e, nodes=nodes).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 10: 0, 11: 0, 20: 20, 21: 20, 30: 30}


def test_connected_components_long_path_converges_fast(spark):
    # a 64-node path has diameter 63; pointer jumping must label it with
    # far fewer than 63 rounds (max_iterations=12 would fail pure
    # edge-step propagation)
    from raven_spark.operators.graph import connected_components

    e = _edges(spark, [(i, i + 1) for i in range(63)])
    got = {r["node"]: r["component"] for r in connected_components(e, max_iterations=12).collect()}
    assert got == {i: 0 for i in range(64)}


def test_connected_components_partition_invariant(spark):
    from raven_spark.operators.graph import connected_components

    pairs = [(i, (i * 7 + 3) % 40) for i in range(40) if i != (i * 7 + 3) % 40]
    for parts in (1, 7):
        e = _edges(spark, pairs).repartition(parts)
        got = sorted(
            (r["node"], r["component"]) for r in connected_components(e).collect()
        )
        if parts == 1:
            base = got
        else:
            assert got == base


def test_neighborhood_function_exact_path(spark):
    from raven_spark.operators.graph import neighborhood_function

    # directed path 0->1->2->3: balls grow one hop per radius step
    e = _edges(spark, [(0, 1), (1, 2), (2, 3)])
    got = {r["node"]: r for r in neighborhood_function(e, radius=2).collect()}
    assert (got[0]["nf1"], got[0]["nf2"]) == (2, 3)
    assert (got[2]["nf1"], got[2]["nf2"]) == (2, 2)
    assert (got[3]["nf1"], got[3]["nf2"]) == (1, 1)
    # harmonic(0) at R=2: (2-1)/1 + (3-2)/2 = 1.5
    assert got[0]["harmonic"] == 1.5
    assert got[3]["harmonic"] == 0.0


def test_hyperball_tracks_exact_neighborhood(spark):
    from raven_spark.operators.graph import hyperball, neighborhood_function

    # deterministic sparse digraph, 300 nodes, out-degree 2
    n = 300
    pairs = []
    for i in range(n):
        pairs.append((i, (i * 13 + 7) % n))
        pairs.append((i, (i * 29 + 3) % n))
    e = _edges(spark, [(a, b) for a, b in pairs if a != b])
    nodes = spark.createDataFrame([(i,) for i in range(n)], "node bigint")
    exact = {r["node"]: r["nf3"] for r in neighborhood_function(e, nodes=nodes, radius=3).collect()}
    approx = {r["node"]: r["anf3"] for r in hyperball(e, nodes=nodes, radius=3, p=6).collect()}
    assert set(approx) == set(exact)
    rel = [abs(approx[v] - exact[v]) / exact[v] for v in exact]
    mean_rel = sum(rel) / len(rel)
    # rse ~ 1.04/sqrt(64) = 13% per estimate; the mean over 300 nodes
    # (shared hash, correlated) stays well inside 0.2
    assert mean_rel < 0.2, mean_rel


def test_hyperball_raw_branch_unbiased_on_dense_ball(spark):
    # hub -> 399 spokes: ball(hub, 1) = 400 > 2.5*m for p in {6, 8}, so
    # the RAW HLL estimator (not linear counting) produces anf1(hub).
    # Guards the rho register distribution: an off-by-one rho doubles
    # the raw estimate (~800), far outside the asserted band.
    from raven_spark.operators.graph import hyperball

    n = 400
    e = _edges(spark, [(0, i) for i in range(1, n)])
    nodes = spark.createDataFrame([(i,) for i in range(n)], "node bigint")
    got = {r["node"]: r["anf1"] for r in hyperball(e, nodes=nodes, radius=1, p=8).collect()}
    # m=256 -> rse ~6.5%; 4 sigma band around the true 400
    assert 300 <= got[0] <= 510, got[0]
    # spokes have out-degree 0: their ball is just themselves
    assert got[5] == 1.0 or abs(got[5] - 1.0) < 0.2


def test_domain_graph_rollup_and_insularity(spark):
    from raven_spark.operators.graph import domain_graph

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 1), (3, 4), (3, 4), (4, 3)],
        "src bigint, dst bigint",
    )
    doms = spark.createDataFrame(
        [(1, "a.com"), (2, "a.com"), (3, "b.com"), (4, "b.com")],
        "node bigint, domain string",
    )
    got = {r["domain"]: r for r in domain_graph(edges, doms).collect()}
    a, b = got["a.com"], got["b.com"]
    # a.com: out edges 1->2 (intra), 1->3, 2->1 (intra) => out_w 3, intra 2
    assert (a["out_w"], a["intra_w"], a["out_domains"]) == (3, 2, 1)
    assert abs(a["intra_frac"] - round(2 / 3, 6)) < 1e-9
    # b.com: 3->4 x2 + 4->3 all intra
    assert (b["out_w"], b["intra_w"], b["out_domains"]) == (3, 3, 0)
    assert b["intra_frac"] == 1.0
    # in-direction: a.com receives 2 intra only... plus nothing external
    assert (a["in_w"], a["in_domains"]) == (2, 0)
    assert (b["in_w"], b["in_domains"]) == (4, 1)


def test_opic_cash_conservation_and_history(spark):
    # 3-cycle 0->1->2->0: cash stays uniform (1/3) every round, so
    # history after r rounds = r/3 and importance is uniform.
    from raven_spark.operators.graph import opic

    e = _edges(spark, [(0, 1), (1, 2), (2, 0)])
    got = {r["node"]: r for r in opic(e, rounds=3).collect()}
    for v in (0, 1, 2):
        assert abs(got[v]["cash"] - round(1 / 3, 6)) < 1e-9
        assert abs(got[v]["history"] - round(1.0, 6)) < 1e-9
        assert abs(got[v]["importance"] - round(1 / 3, 6)) < 1e-9


def test_opic_dangling_cash_returns_via_virtual_root(spark):
    # 0->1, 1 dangling, isolate 2. Total cash must stay 1 every round
    # (the virtual root redistributes dangling + isolate cash), and the
    # sink node 1 banks more history than the source 0.
    from raven_spark.operators.graph import opic

    e = _edges(spark, [(0, 1)])
    nodes = spark.createDataFrame([(0,), (1,), (2,)], "node bigint")
    rows = opic(e, nodes=nodes, rounds=4).collect()
    got = {r["node"]: r for r in rows}
    total_cash = sum(r["cash"] for r in rows)
    assert abs(total_cash - 1.0) < 1e-6, total_cash
    assert got[1]["history"] > got[0]["history"] > 0
    assert abs(sum(r["importance"] for r in rows) - 1.0) < 5e-6
    # node 0 has no in-edges, so like the isolate it receives only the
    # root share — their banked histories are identical by symmetry
    assert got[2]["history"] == got[0]["history"]


def test_opic_partition_invariant(spark):
    from raven_spark.operators.graph import opic

    pairs = [(i, (i * 7 + 3) % 23) for i in range(23) if i != (i * 7 + 3) % 23]
    a = sorted(map(tuple, opic(_edges(spark, pairs), rounds=3).collect()))
    b = sorted(
        map(tuple, opic(_edges(spark, pairs).repartition(7), rounds=3).collect())
    )
    assert a == b


def test_cocitation_counts_shared_sources(spark):
    # sources 0,1,2 all cite both 10 and 11; source 0 also cites 12.
    from raven_spark.operators.graph import cocitation_pairs

    e = _edges(spark, [(0, 10), (0, 11), (0, 12), (1, 10), (1, 11), (2, 10), (2, 11)])
    rows = cocitation_pairs(e, min_shared=2).collect()
    got = {(r["node_a"], r["node_b"]): r["cocite"] for r in rows}
    assert got[(10, 11)] == 3
    # (10,12)/(11,12) share only source 0 -> floored out by min_shared=2
    assert (10, 12) not in got and (11, 12) not in got


def test_cocitation_degree_cap_bounds_hub_explosion(spark):
    # a hub source citing 10 targets is capped at 3 (dst asc): only
    # targets 0,1,2 survive -> C(3,2)=3 pairs, each cocite 1
    from raven_spark.operators.graph import cocitation_pairs

    e = _edges(spark, [(99, t) for t in range(10)])
    rows = cocitation_pairs(e, degree_cap=3, min_shared=1).collect()
    assert sorted((r["node_a"], r["node_b"]) for r in rows) == [(0, 1), (0, 2), (1, 2)]


def test_resolve_redirects_chains_terminals_cycles(spark):
    """Pointer doubling: clean chains resolve with exact hop counts;
    cycles (and chains entering one) flag resolved=False with
    hops = 2^max_doublings, landing on f^H(src)."""
    from raven_spark.operators.graph import resolve_redirects

    edges = spark.createDataFrame(
        # chain 5 -> 4 -> 3 -> 0 (terminal), plus a 2-cycle 10 <-> 11
        # entered from 12, plus a multi-edge src (20 -> {21, 22})
        [(5, 4), (4, 3), (3, 0), (10, 11), (11, 10), (12, 10), (20, 22), (20, 21)],
        "src long, dst long",
    )
    out = {r["src"]: r for r in resolve_redirects(edges, max_doublings=3).collect()}
    assert out[5]["final_dst"] == 0 and out[5]["hops"] == 3 and out[5]["resolved"]
    assert out[4]["final_dst"] == 0 and out[4]["hops"] == 2
    assert out[3]["final_dst"] == 0 and out[3]["hops"] == 1
    # cycle rows: unresolved, hops = 2^3 = 8, final = f^8(src)
    assert not out[10]["resolved"] and out[10]["hops"] == 8
    assert out[10]["final_dst"] == 10  # even orbit
    assert not out[11]["resolved"] and out[11]["final_dst"] == 11
    assert not out[12]["resolved"]  # chain into cycle
    # multi-edge deduped to min(dst): 20 -> 21 (terminal)
    assert out[20]["final_dst"] == 21 and out[20]["resolved"]


def test_resolve_redirects_partition_invariant(spark):
    from raven_spark.operators.graph import resolve_redirects

    edges = spark.range(1, 400).selectExpr(
        "id as src", "case when id % 16 <> 0 then id - 1 end as dst"
    ).filter("dst is not null")
    a = sorted(map(tuple, resolve_redirects(edges).collect()))
    b = sorted(map(tuple, resolve_redirects(edges.repartition(13)).collect()))
    assert a == b
    # every chain terminates at its floor multiple of 16
    for src, fin, hops, ok in a:
        assert ok and fin == (src // 16) * 16 and hops == src - fin


def test_link_reciprocity_rings_vs_chains(spark):
    from raven_spark.operators.graph import link_reciprocity

    edges = spark.createDataFrame(
        # ring 1<->2, 2<->3 (nepotism clique); chain 4->5->6; self-loop 7
        [(1, 2), (2, 1), (2, 3), (3, 2), (4, 5), (5, 6), (7, 7), (1, 2)],
        "src long, dst long",
    )
    out = {r["node"]: r for r in link_reciprocity(edges).collect()}
    assert out[1]["n_out"] == 1 and out[1]["reciprocity"] == 1.0
    assert out[2]["n_out"] == 2 and out[2]["n_recip"] == 2
    assert out[4]["reciprocity"] == 0.0 and out[5]["reciprocity"] == 0.0
    assert 7 not in out  # self-loop only -> no distinct outlinks
    assert 6 not in out  # sink: no outlinks
    # duplicate edge (1,2) did not double-count
    assert out[1]["n_recip"] == 1
    again = {r["node"]: r for r in link_reciprocity(edges.repartition(5)).collect()}
    assert {k: tuple(v) for k, v in out.items()} == {k: tuple(v) for k, v in again.items()}

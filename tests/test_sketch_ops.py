"""Session-5 operator batch: TrustRank/spam mass, adaptive politeness
budgets, approx-quantile + CMS sketch contracts, PQ encoding, DoReMi
mixture weights, term drift, KMV mirror sketches.

Each test checks (a) semantics against a hand-computed or pure-Python
twin, and (b) partition invariance where the operator claims it.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# --- trustrank -----------------------------------------------------------------


def _tiny_graph(spark):
    # 0 -> 1 -> 2 -> 0 (trusted ring) ; 3 <-> 4 (spam farm) ; 4 -> 1
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (3, 4), (4, 3), (4, 1)], "src long, dst long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(5)], "node long")
    return edges, nodes


def test_trustrank_trust_stays_near_seeds(spark):
    from raven_spark.operators.graph import trustrank

    edges, nodes = _tiny_graph(spark)
    seeds = spark.createDataFrame([(0,)], "node long")
    out = {r["node"]: r for r in trustrank(edges, seeds, nodes=nodes).collect()}
    # the spam farm (3, 4) is unreachable from seed 0 -> zero trust,
    # full spam mass; ring nodes carry trust
    assert out[3]["trustrank"] == 0.0 and out[4]["trustrank"] == 0.0
    assert out[3]["spam_mass"] == 1.0 and out[4]["spam_mass"] == 1.0
    for v in (0, 1, 2):
        assert out[v]["trustrank"] > 0.0
        assert out[v]["spam_mass"] < 1.0
    # pagerank column matches the standalone operator
    from raven_spark.operators.graph import pagerank

    pr = {r["node"]: r["pagerank"] for r in pagerank(edges, nodes=nodes).collect()}
    for v in range(5):
        assert out[v]["pagerank"] == pr[v]


def test_trustrank_python_twin_and_partition_invariance(spark):
    from raven_spark.operators.graph import trustrank

    edges, nodes = _tiny_graph(spark)
    seeds = spark.createDataFrame([(0,), (3,)], "node long")
    out = {r["node"]: r["trustrank"] for r in trustrank(edges, seeds, nodes=nodes).collect()}

    # pure-python twin of the documented recurrence
    E = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 3), (4, 1)]
    outdeg = {}
    for s, _ in E:
        outdeg[s] = outdeg.get(s, 0) + 1
    S = {0, 3}
    d = 0.85
    tr = {v: (round(1.0 / len(S), 12) if v in S else 0.0) for v in range(5)}
    for _ in range(3):
        contrib = {v: 0.0 for v in range(5)}
        for s, t in E:
            contrib[t] += tr[s] / outdeg[s]
        tr = {
            v: round(
                (round(0.15 / len(S), 12) if v in S else 0.0) + d * contrib[v], 12
            )
            for v in range(5)
        }
    for v in range(5):
        assert out[v] == pytest.approx(round(tr[v], 6), abs=1e-9)

    out2 = {
        r["node"]: r["trustrank"]
        for r in trustrank(edges.repartition(7), seeds, nodes=nodes.repartition(3)).collect()
    }
    assert out == out2


def test_trustrank_empty_seeds_raises(spark):
    from raven_spark.operators.graph import trustrank

    edges, nodes = _tiny_graph(spark)
    with pytest.raises(ValueError):
        trustrank(edges, spark.createDataFrame([], "node long"), nodes=nodes)


# --- adaptive politeness budgets -------------------------------------------------


def test_adaptive_budget_matches_ewma_recurrence(spark):
    from raven_spark.operators.politeness import adaptive_host_budget

    rows = [
        ("fast.example", 1, 40.0),
        ("fast.example", 2, 60.0),
        ("fast.example", 3, 50.0),
        ("slow.example", 1, 900.0),
        ("slow.example", 2, 1100.0),
        ("one.example", 5, 200.0),
    ]
    df = spark.createDataFrame(rows, "host string, round_no int, latency_ms double")
    out = {r["host"]: r for r in adaptive_host_budget(df, alpha=0.3).collect()}

    def ewma(xs, a=0.3):
        # closed form the operator documents
        n = len(xs)
        s = (1 - a) ** (n - 1) * xs[0]
        for i in range(2, n + 1):
            s += a * (1 - a) ** (n - i) * xs[i - 1]
        return round(s, 9)

    e_fast = ewma([40.0, 60.0, 50.0])
    assert out["fast.example"]["ewma_ms"] == pytest.approx(round(e_fast, 6))
    # budget = clamp(round(10 * 200 / ewma), 1, 50)
    assert out["fast.example"]["budget"] == min(50, max(1, round(10 * 200.0 / e_fast)))
    assert out["slow.example"]["budget"] <= 2  # degraded host sheds load
    # single-round host: ewma == its own mean, budget from it
    assert out["one.example"]["ewma_ms"] == 200.0
    assert out["one.example"]["budget"] == 10


def test_adaptive_budget_partition_invariant_and_mean_first(spark):
    from raven_spark.operators.politeness import adaptive_host_budget

    # two samples in the same round average BEFORE the EWMA
    rows = [("h", 1, 100.0), ("h", 1, 300.0), ("h", 2, 100.0)]
    df = spark.createDataFrame(rows, "host string, round_no int, latency_ms double")
    out = adaptive_host_budget(df, alpha=0.5).collect()[0]
    assert out["ewma_ms"] == pytest.approx(round(0.5 * 100 + 0.5 * 200, 6))
    out2 = adaptive_host_budget(df.repartition(5), alpha=0.5).collect()[0]
    assert out == out2
    with pytest.raises(ValueError):
        adaptive_host_budget(df, alpha=0.0)


# --- approx-quantile contract ----------------------------------------------------


def test_approx_quantile_contract_holds_and_exact_matches(spark):
    from raven_spark.operators.pipeline_sketches import approx_quantile_contract

    df = spark.range(10_000, numPartitions=8).selectExpr(
        "concat('g', pmod(id, 3)) as k", "cast(pmod(xxhash64(id), 1000) as double) as v"
    )
    out = approx_quantile_contract(df, "k", "v", percentiles=(0.5, 0.9), accuracy=1000)
    rows = out.collect()
    assert len(rows) == 6  # 3 groups x 2 percentiles
    assert all(r["within_bound"] for r in rows)
    # exact value replays Spark's own exact percentile
    one = [r for r in rows if r["k"] == "g0" and r["p"] == 0.5][0]
    exact = df.filter("k = 'g0'").agg(
        F.round(F.percentile("v", F.lit(0.5)), 6).alias("e")
    ).collect()[0]["e"]
    assert one["exact_value"] == exact


def test_approx_quantile_contract_flags_a_broken_sketch(spark):
    """Force a tiny accuracy so the rank band is wide, then check the
    bound arithmetic by shrinking rank_slack on a pathological column
    where approx == exact (constant column always passes)."""
    from raven_spark.operators.pipeline_sketches import approx_quantile_contract

    df = spark.range(100).selectExpr("'g' as k", "cast(1.0 as double) as v")
    rows = approx_quantile_contract(df, "k", "v", percentiles=(0.5,), accuracy=10).collect()
    assert rows[0]["within_bound"] and rows[0]["exact_value"] == 1.0


# --- count-min sketch ------------------------------------------------------------


def test_cms_never_underestimates_and_is_exact_when_wide(spark):
    from raven_spark.operators.pipeline_sketches import cms_frequency

    df = spark.range(50_000, numPartitions=8).selectExpr("pmod(xxhash64(id), 97) as k")
    out = cms_frequency(df, "k", depth=4, width=4096).collect()
    assert len(out) == 97
    # width >> distinct keys: whp no collisions in at least one row -> exact
    assert all(r["no_underestimate"] for r in out)
    assert all(r["cms_estimate"] == r["exact_count"] for r in out)


def test_cms_overestimates_under_collision_pressure(spark):
    from raven_spark.operators.pipeline_sketches import cms_frequency

    # 2000 distinct keys into width=16 forces collisions: estimates must
    # stay upper bounds, and at least one must strictly overestimate
    df = spark.range(20_000, numPartitions=4).selectExpr("pmod(xxhash64(id), 2000) as k")
    out = cms_frequency(df, "k", depth=4, width=16).collect()
    assert all(r["no_underestimate"] for r in out)
    assert any(r["cms_estimate"] > r["exact_count"] for r in out)
    # total mass conservation per hash row is implied; spot-check bound
    n = 20_000
    eps = math.e / 16
    # CM bound holds in expectation w.p. 1-e^-4 per key; allow the loose check
    viol = sum(1 for r in out if r["cms_estimate"] - r["exact_count"] > eps * n)
    assert viol == 0


def test_cms_depth_validation(spark):
    from raven_spark.operators.pipeline_sketches import cms_frequency

    df = spark.range(10).selectExpr("id as k")
    with pytest.raises(ValueError):
        cms_frequency(df, "k", depth=9)


# --- product quantization --------------------------------------------------------


def test_pq_codebook_rows_encode_to_themselves(spark):
    from raven_spark.operators.similarity import pq_encode

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = pq_encode(emb, m=4, k=16, dim=64)
    first = {r["vec_id"]: r for r in out.filter(F.col("vec_id") < 16).collect()}
    for vid in range(16):
        assert first[vid]["codes"] == [vid] * 4
        assert first[vid]["recon_mse"] == 0.0
    # codes are valid and mse non-negative everywhere
    bad = out.filter(
        (F.array_max("codes") >= 16) | (F.array_min("codes") < 0) | (F.col("recon_mse") < 0)
    ).count()
    assert bad == 0


def test_pq_matches_numpy_twin(spark):
    import numpy as np

    from raven_spark.operators.similarity import pq_encode

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = sorted(emb.collect(), key=lambda r: r["vec_id"])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    books = mat[:16]  # codebook = 16 smallest ids
    m, sub = 4, 16
    out = {r["vec_id"]: r for r in pq_encode(emb, m=4, k=16, dim=64).collect()}
    for r in rows[:50]:
        x = np.array(r["embedding"], dtype=np.float64)
        codes, mse = [], 0.0
        for s in range(m):
            xs = x[s * sub : (s + 1) * sub]
            d = ((books[:, s * sub : (s + 1) * sub] - xs) ** 2).sum(axis=1)
            j = int(d.argmin())
            codes.append(j)
            mse += d[j]
        got = out[r["vec_id"]]
        assert got["codes"] == codes
        assert got["recon_mse"] == pytest.approx(round(mse / 64.0, 6), abs=1e-6)


def test_pq_validates_inputs(spark):
    from raven_spark.operators.similarity import pq_encode

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    with pytest.raises(ValueError):
        pq_encode(emb, m=5, k=16, dim=64)
    with pytest.raises(ValueError):
        pq_encode(emb.limit(3), m=4, k=16, dim=64)


# --- doremi mixture weights ------------------------------------------------------


def test_doremi_matches_python_twin_and_sums_to_one(spark):
    from raven_spark.operators.sampling import doremi_weights

    rows = [("a", 1.0), ("a", 3.0), ("b", 0.5), ("c", 2.0)]
    df = spark.createDataFrame(rows, "domain string, loss double")
    out = {r["domain"]: r for r in doremi_weights(df, "domain", "loss", eta=0.5).collect()}

    losses = {"a": round(2.0, 9), "b": round(0.5, 9), "c": round(2.0, 9)}
    w = {d: round(1.0 / 3.0, 9) for d in losses}
    for _ in range(3):
        raw = {
            d: round(w[d] * math.exp(0.5 * losses[d] * (1.0 - w[d])), 9) for d in w
        }
        tot = sum(raw.values())
        w = {d: round(raw[d] / tot, 9) for d in w}
    for d in losses:
        assert out[d]["weight"] == pytest.approx(round(w[d], 6), abs=2e-6)
        assert out[d]["loss"] == pytest.approx(round(losses[d], 6))
    assert sum(r["weight"] for r in out.values()) == pytest.approx(1.0, abs=1e-4)
    # higher loss -> higher weight
    assert out["a"]["weight"] > out["b"]["weight"]


def test_doremi_partition_invariance(spark):
    from raven_spark.operators.sampling import doremi_weights

    df = spark.range(3_000, numPartitions=8).selectExpr(
        "concat('d', pmod(id, 5)) as domain",
        "cast(pmod(xxhash64(id), 100) as double) / 100 as loss",
    )
    a = {r["domain"]: r["weight"] for r in doremi_weights(df, "domain", "loss").collect()}
    b = {
        r["domain"]: r["weight"]
        for r in doremi_weights(df.repartition(3), "domain", "loss").collect()
    }
    assert a == b


# --- term drift ------------------------------------------------------------------


def test_term_drift_surfaces_the_planted_term(spark):
    from raven_spark.operators.pipeline_lexical import term_drift

    # slice A gets 'zzzdrift' injected into every doc; shared vocab elsewhere
    rows = [(i, ("common words here " + ("zzzdrift " if i % 2 == 0 else "stable ")) * 10)
            for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = term_drift(df, F.col("doc_id") % 2 == 0, min_count=20, k=5).collect()
    assert out[0]["term"] in ("zzzdrift", "stable")
    top_terms = {r["term"] for r in out[:2]}
    assert top_terms == {"zzzdrift", "stable"}
    z = [r for r in out if r["term"] == "zzzdrift"][0]
    assert z["n_a"] == 1000 and z["n_b"] == 0
    # balanced terms score ~0 and rank below
    c = [r for r in out if r["term"] == "common"]
    assert not c or c[0]["chi2"] < out[0]["chi2"]


def test_term_drift_chi2_matches_hand_formula(spark):
    from raven_spark.operators.pipeline_lexical import term_drift

    rows = [(0, "x x y"), (1, "x y y")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["term"]: r for r in term_drift(df, F.col("doc_id") == 0, min_count=1, k=10).collect()}
    # totals: NA=3, NB=3; term x: n_a=2, n_b=1 -> e_a=1.5, e_b=1.5
    exp = (2 - 1.5) ** 2 / 1.5 * 2
    assert out["x"]["chi2"] == pytest.approx(round(exp, 6))
    assert out["y"]["chi2"] == pytest.approx(round(exp, 6))


# --- KMV mirror pairs ------------------------------------------------------------


def test_kmv_detects_a_mirror_host(spark):
    from raven_spark.operators.dedup import kmv_mirror_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    other = "one two three four five six seven eight nine ten " * 5
    rows = (
        [(f"m{i}", "mirror-a.example", base + f" tail{i}") for i in range(5)]
        + [(f"n{i}", "mirror-b.example", base + f" tailx{i}") for i in range(5)]
        + [(f"o{i}", "other.example", other + f" tail{i}") for i in range(5)]
    )
    df = spark.createDataFrame(rows, "doc_id string, host string, text string")
    out = {
        (r["group_a"], r["group_b"]): r
        for r in kmv_mirror_pairs(df, F.col("host"), shingle_n=3, k=64).collect()
    }
    mirror = out[("mirror-a.example", "mirror-b.example")]
    # shared ring shingles = 10, each host adds 5 doc-unique tail
    # shingles -> exact Jaccard = 10 / 20 = 0.5 by construction
    assert mirror["exact_jaccard"] == pytest.approx(0.5)
    assert mirror["est_jaccard"] > 0.3
    for pair, r in out.items():
        if "other.example" in pair and pair != ("mirror-a.example", "mirror-b.example"):
            assert r["exact_jaccard"] < 0.1


def test_kmv_est_exact_when_union_fits_in_k(spark):
    from raven_spark.operators.dedup import kmv_mirror_pairs

    # tiny vocab: every distinct shingle key fits inside k -> est == exact
    rows = [("a", "h1", "p q r s t u"), ("b", "h2", "p q r s x y")]
    df = spark.createDataFrame(rows, "doc_id string, host string, text string")
    r = kmv_mirror_pairs(df, F.col("host"), shingle_n=3, k=64).collect()[0]
    assert r["est_jaccard"] == r["exact_jaccard"]
    # h1: shingles {pqr,qrs,rst,stu}; h2: {pqr,qrs,rsx,sxy}; inter=2, union=6
    assert r["exact_jaccard"] == pytest.approx(round(2 / 6, 6))


def test_kmv_sketch_only_mode(spark):
    """audit=False is the production mode (VERDICT r4 item 5): the
    exact_jaccard column is gone, sketch rows are unchanged, and the
    PLAN never joins the full per-host key sets — the only joins left
    are the three over the k-row sketch relation (candidate block +
    two merge sides), so join count drops by exactly the audit's four
    (intersection + two size joins + the final left join)."""
    import re

    from raven_spark.operators.dedup import kmv_mirror_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    g = F.concat(F.lit("h"), (F.col("doc_id") % 4).cast("string"))
    full = kmv_mirror_pairs(docs, g, k=32, audit=True)
    lean = kmv_mirror_pairs(docs, g, k=32, audit=False)
    assert lean.columns == ["group_a", "group_b", "n_shared", "est_jaccard"]
    a = sorted((r[0], r[1], r[2], r[3]) for r in full.collect())
    b = sorted(map(tuple, lean.collect()))
    assert a == b and len(a) > 0

    def njoins(df):
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        return len(re.findall(r"\bJoin\b", plan))

    assert njoins(full) - njoins(lean) == 4


def test_kmv_partition_invariance(spark):
    from raven_spark.operators.dedup import kmv_mirror_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    g = F.concat(F.lit("h"), (F.col("doc_id") % 4).cast("string"))
    a = sorted(map(tuple, kmv_mirror_pairs(docs, g, k=32).collect()))
    b = sorted(map(tuple, kmv_mirror_pairs(docs.repartition(11), g, k=32).collect()))
    assert a == b


def test_adaptive_budget_zero_latency_awards_max(spark):
    # ewma == 0 (mocked instant fetches) means "infinitely fast": the
    # budget must be max_budget, not an ANSI divide-by-zero job kill.
    from raven_spark.operators.politeness import adaptive_host_budget

    lat = spark.createDataFrame(
        [("h0", 0, 0.0), ("h0", 1, 0.0), ("h1", 0, 400.0)],
        "host string, round_no int, latency_ms double",
    )
    got = {r["host"]: r for r in adaptive_host_budget(lat, max_budget=50).collect()}
    assert got["h0"]["budget"] == 50 and got["h0"]["ewma_ms"] == 0.0
    assert 1 <= got["h1"]["budget"] < 50


def test_term_drift_empty_slice_yields_empty(spark):
    # drift against an entirely-empty slice is undefined (every expected
    # count is 0): the contract is an EMPTY result, not a crash.
    from raven_spark.operators.pipeline_lexical import term_drift

    df = spark.createDataFrame(
        [(1, "alpha beta gamma alpha"), (2, "alpha beta")],
        "doc_id bigint, text string",
    )
    out = term_drift(df, slice_col=F.lit(True), min_count=1, k=10)
    assert out.count() == 0

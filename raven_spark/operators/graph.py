"""Link-graph analytics over crawl-discovered edges — the frontier-
prioritization layer a web-scale crawl adds on top of raven's FIFO/
priority round scheduling (reference scope ends at fetch+persist;
scheduler.rs orders within a round only). PageRank-style scores are the
classic crawl-priority signal (what to fetch next at 10^10 URLs) and a
standard quality prior for training-data curation.

Design for scale:

- Edges are the ONLY big table; each iteration is one shuffle-join of
  edges (partitioned by src) against the current rank vector plus one
  aggregation keyed by dst. The out-degree join is computed once and
  stays fused with the edge table, so iteration k shuffles rank rows
  (8-byte key + double), never the edge list again.
- Iterative lineage grows linearly; ``checkpoint_every`` cuts it with
  localCheckpoint the same way minhash_dedup's fixpoint loop does
  (operators/dedup.py).
- Per-iteration rounding (``iter_dp``, default 12 decimal places) makes
  the float sums order-independent in practice, so two runs with
  different partitionings — or a DuckDB replay summing in a different
  order — produce byte-identical ranks (driver oracle q36). The 1e-12
  quantum is ~1e4x coarser than double ulps at rank magnitudes and
  ~1e6x finer than the 6-dp reporting precision.
- Dangling mass is NOT redistributed (documented divergence from the
  canonical formulation): nodes with out-degree 0 leak their rank. At
  crawl scale dangling URLs are typically pruned or given a self-loop
  upstream; callers who need conservation add self-loops to the edge
  table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def degrees(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node (node, outdeg, indeg) over the union of endpoints."""
    outd = edges.groupBy(F.col(src).alias("node")).agg(F.count(F.lit(1)).alias("outdeg"))
    ind = edges.groupBy(F.col(dst).alias("node")).agg(F.count(F.lit(1)).alias("indeg"))
    return (
        outd.join(ind, "node", "full")
        .select(
            "node",
            F.coalesce("outdeg", F.lit(0)).alias("outdeg"),
            F.coalesce("indeg", F.lit(0)).alias("indeg"),
        )
    )


def pagerank(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    iter_dp: int = 12,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Damped PageRank, ``iterations`` synchronous power steps.

    pr_0(v) = round(1/N, iter_dp)
    pr_{k+1}(v) = round((1-d)/N + d * sum_{(u,v) in E} pr_k(u)/outdeg(u),
                        iter_dp)

    ``nodes``: one-column ("node") DataFrame of the vertex set; defaults
    to the distinct union of edge endpoints. N is counted once on the
    driver (a single count action over the node set — O(1) result, not a
    collect).

    Returns (node, pagerank) with pagerank rounded to 6 dp for
    reporting; intermediate ranks carry iter_dp places (see module
    docstring for why the rounding makes runs replayable).
    """
    if nodes is None:
        nodes = (
            edges.select(F.col(src).alias("node"))
            .union(edges.select(F.col(dst).alias("node")))
            .distinct()
        )
    n = nodes.count()
    outd = edges.groupBy(src).agg(F.count(F.lit(1)).alias("__outdeg"))
    e = edges.select(src, dst).join(outd, src)
    base = F.round(F.lit(1.0 - damping) / F.lit(float(n)), iter_dp)
    pr = nodes.select("node", F.round(F.lit(1.0) / F.lit(float(n)), iter_dp).alias("pr"))
    for k in range(iterations):
        contrib = (
            e.join(pr, e[src] == pr["node"])
            .groupBy(dst)
            .agg(F.sum(F.col("pr") / F.col("__outdeg")).alias("__s"))
        )
        pr = (
            nodes.join(contrib, nodes["node"] == contrib[dst], "left")
            .select(
                "node",
                F.round(base + F.lit(damping) * F.coalesce("__s", F.lit(0.0)), iter_dp).alias("pr"),
            )
        )
        if checkpoint_every and (k + 1) % checkpoint_every == 0 and k + 1 < iterations:
            pr = pr.localCheckpoint(eager=False)
    return pr.select("node", F.round("pr", 6).alias("pagerank"))


def trustrank(
    edges: DataFrame,
    seeds: DataFrame,
    nodes: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    iter_dp: int = 12,
    checkpoint_every: int = 5,
) -> DataFrame:
    """TrustRank (Gyongyi, Garcia-Molina, Pedersen, VLDB 2004) + spam
    mass — the anti-spam crawl-priority signal PageRank alone lacks.
    Identical power iteration to :func:`pagerank` except the teleport
    vector is uniform over a human-vetted SEED set instead of all
    nodes: trust flows out from the seeds along links, so link farms
    (which bootstrap rank from nowhere) collect PageRank but no trust.

    tr_0(v)     = round(1/|S|, iter_dp) if v in S else 0
    tr_{k+1}(v) = round((1-d)*[v in S]/|S|
                        + d * sum_{(u,v) in E} tr_k(u)/outdeg(u), iter_dp)

    The crawl/curation verdict is SPAM MASS (Gyongyi et al. 2006):
    the fraction of a node's PageRank not backed by trust,
    ``spam_mass = (pr - tr_scaled) / pr`` with tr rescaled so both
    vectors sum to the same mass (both leak dangling mass identically,
    so the raw ratio is comparable; we report the UNSCALED simple form
    ``(pr - tr)/pr`` clamped to [0,1], the common operational variant —
    high values = rank earned without trust = demote/deprioritize).

    Scale shape: same as pagerank — each iteration shuffles only the
    O(nodes) trust vector (8-byte key + double) against the
    outdeg-fused edge table; the seed set joins once as a broadcast
    flag (O(seeds) << O(nodes)). Per-iteration iter_dp rounding keeps
    the float sums order-independent → replayable across partitionings
    and in the DuckDB twin (driver q104).

    ``seeds``: one-column ("node") DataFrame of trusted nodes.
    Returns (node, trustrank, pagerank, spam_mass), 6-dp reporting.
    """
    if nodes is None:
        nodes = (
            edges.select(F.col(src).alias("node"))
            .union(edges.select(F.col(dst).alias("node")))
            .distinct()
        )
    n_seeds = seeds.count()
    if n_seeds == 0:
        raise ValueError("trustrank: seed set is empty")
    outd = edges.groupBy(src).agg(F.count(F.lit(1)).alias("__outdeg"))
    e = edges.select(src, dst).join(outd, src)
    seed_flag = F.broadcast(seeds.select(F.col("node"), F.lit(True).alias("__is_seed")))
    base_nodes = nodes.join(seed_flag, "node", "left").select(
        "node", F.coalesce("__is_seed", F.lit(False)).alias("__is_seed")
    )
    teleport = F.when(
        F.col("__is_seed"),
        F.round(F.lit(1.0 - damping) / F.lit(float(n_seeds)), iter_dp),
    ).otherwise(F.lit(0.0))
    tr = base_nodes.select(
        "node",
        "__is_seed",
        F.when(
            F.col("__is_seed"), F.round(F.lit(1.0) / F.lit(float(n_seeds)), iter_dp)
        ).otherwise(F.lit(0.0)).alias("tr"),
    )
    for k in range(iterations):
        contrib = (
            e.join(tr.select("node", "tr"), e[src] == F.col("node"))
            .groupBy(dst)
            .agg(F.sum(F.col("tr") / F.col("__outdeg")).alias("__s"))
        )
        tr = (
            base_nodes.join(contrib, base_nodes["node"] == contrib[dst], "left")
            .select(
                "node",
                "__is_seed",
                F.round(
                    teleport + F.lit(damping) * F.coalesce("__s", F.lit(0.0)), iter_dp
                ).alias("tr"),
            )
        )
        if checkpoint_every and (k + 1) % checkpoint_every == 0 and k + 1 < iterations:
            tr = tr.localCheckpoint(eager=False)
    pr = pagerank(
        edges,
        nodes=nodes,
        src=src,
        dst=dst,
        iterations=iterations,
        damping=damping,
        iter_dp=iter_dp,
        checkpoint_every=checkpoint_every,
    )
    out = tr.select("node", F.round("tr", 6).alias("trustrank")).join(pr, "node")
    spam = F.when(
        F.col("pagerank") <= 0, F.lit(0.0)
    ).otherwise(
        F.greatest(
            F.lit(0.0),
            F.least(
                F.lit(1.0),
                (F.col("pagerank") - F.col("trustrank")) / F.col("pagerank"),
            ),
        )
    )
    return out.select(
        "node", "trustrank", "pagerank", F.round(spam, 6).alias("spam_mass")
    )


# the \s before href is the attribute-name boundary: without it
# 'data-href="..."' would match via its 'href' substring and feed a
# wrong target into the profile
_A_ELEM = r"(?is)<a\s(?:[^>]*?\s)?href\s*=\s*(?:\"[^\"]*\"|'[^']*')[^>]*>.*?</a>"


def anchor_texts(
    df: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """(src_url, href, anchor_text) per <a> element — the classic link
    signal: anchor text is the linking page's own description of the
    TARGET, the input to focused-crawl frontier priority and target-page
    keyword profiles (it predates and outlives PageRank as a relevance
    feature). Pure column algebra: one regexp_extract_all for the <a>
    elements, per-element extracts for the href (double- or single-
    quoted) and the inner text (tags stripped, whitespace collapsed) —
    zero Python, SQL-replayable, unlike the fetch path's Python href
    scanner (functions/text.py::extract_links) which stays the crawl-
    side fast path. html may be a string or binary column (cast)."""
    html = F.col(html_col).cast("string")
    elems = F.regexp_extract_all(html, F.lit(_A_ELEM), 0)
    out = df.select(
        F.col(url_col).alias("src_url"), F.explode(elems).alias("__a")
    )
    href_d = F.regexp_extract(F.col("__a"), r'(?is)\shref\s*=\s*"([^"]*)"', 1)
    href_s = F.regexp_extract(F.col("__a"), r"(?is)\shref\s*=\s*'([^']*)'", 1)
    inner = F.regexp_extract(F.col("__a"), r"(?is)^<a[^>]*>(.*)</a>$", 1)
    text = F.trim(
        F.regexp_replace(
            F.regexp_replace(inner, r"<[^>]+>", " "), r"\s+", " "
        )
    )
    return out.select(
        "src_url",
        F.when(href_d != "", href_d).otherwise(href_s).alias("href"),
        text.alias("anchor_text"),
    ).filter(F.col("href") != "")


def anchor_profile(anchors: DataFrame, k: int = 3) -> DataFrame:
    """Per-TARGET anchor-term profile: for each href, the top-k anchor
    words across every page that links to it (count desc, term asc
    tiebreak) plus how many anchors/distinct sources describe it. The
    aggregate the frontier can join for priority (a target many sources
    describe with query-relevant words is worth fetching sooner — the
    focused-crawling signal).

    Scale shape: word explode -> (href, term) map-side-combinable
    count; n_anchors/n_sources one aggregate; per-href top-k via a
    LITERAL-bound row_number (WindowGroupLimit). Term text rides the
    shuffle (the profile needs the strings) — same documented
    dictionary-encode posture as tfidf_topk at 100 TB."""
    from raven_spark.operators.dedup import norm_text_col

    words = anchors.select(
        "href",
        "src_url",
        F.explode(
            F.filter(
                F.split(norm_text_col(F.col("anchor_text")), " "),
                lambda w: F.length(w) > 0,
            )
        ).alias("term"),
    )
    counts = words.groupBy("href", "term").agg(
        F.count(F.lit(1)).alias("term_count")
    )
    totals = anchors.groupBy("href").agg(
        F.count(F.lit(1)).alias("n_anchors"),
        F.countDistinct("src_url").alias("n_sources"),
    )
    w = Window.partitionBy("href").orderBy(
        F.col("term_count").desc(), F.col("term").asc()
    )
    topk = (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.lit(int(k)))
    )
    return topk.join(totals, "href").select(
        "href", "term", "term_count", "rank", "n_anchors", "n_sources"
    )


def hits(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 2,
    iter_dp: int = 12,
    checkpoint_every: int = 1,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999, JACM — the other classic
    link-analysis signal: an AUTHORITY is pointed to by good hubs, a HUB
    points to good authorities; for a crawl, hub scores rank index/
    listing pages whose outlinks are worth expanding, the complement of
    PageRank's global-importance prior):

        a_{k+1}(v) = round(norm1( sum_{(u,v)} h_k(u) ), iter_dp)
        h_{k+1}(u) = round(norm1( sum_{(u,v)} a_{k+1}(v) ), iter_dp)

    starting from all-ones, with L1 normalization (sum = 1) — chosen
    over the paper's L2 because it is exactly replayable in SQL (no
    sqrt of a sum of squares accumulating engine-specific rounding) and
    differs only by a positive scalar per iteration, which preserves
    rankings. The per-iteration iter_dp rounding makes runs bit-
    replayable across partitionings/engines, the pagerank convention.

    Scale shape mirrors pagerank: each half-step is one hash join on
    the edge key + one map-side-combinable sum; normalization is a
    1-row aggregate broadcast back (never a driver value per
    iteration). Lineage cuts default to EVERY iteration (not
    pagerank's 5): _norm references its input twice (total + rescale),
    so the uncut logical plan quadruples per iteration — the cut keeps
    analysis cost linear in ``iterations``.

    Returns (node, authority, hub) rounded to 6 dp.
    """
    if nodes is None:
        nodes = (
            edges.select(F.col(src).alias("node"))
            .union(edges.select(F.col(dst).alias("node")))
            .distinct()
        )
    e = edges.select(src, dst)

    def _norm(df: DataFrame, col: str) -> DataFrame:
        tot = df.agg(F.sum(col).alias("__tot"))
        return df.crossJoin(F.broadcast(tot)).select(
            "node",
            F.round(
                F.col(col) / F.when(F.col("__tot") > 0, F.col("__tot"))
                .otherwise(F.lit(1.0)),
                iter_dp,
            ).alias(col),
        )

    if iterations < 1:
        raise ValueError("hits: iterations must be >= 1")
    h = nodes.select("node", F.lit(1.0).alias("h"))
    a = h  # overwritten in the first half-step; the recurrence starts from h
    for k in range(iterations):
        asum = (
            e.join(h, e[src] == h["node"])
            .groupBy(dst)
            .agg(F.sum("h").alias("__s"))
        )
        a = _norm(
            nodes.join(asum, nodes["node"] == asum[dst], "left").select(
                "node", F.coalesce("__s", F.lit(0.0)).alias("a")
            ),
            "a",
        )
        hsum = (
            e.join(a, e[dst] == a["node"])
            .groupBy(src)
            .agg(F.sum("a").alias("__s"))
        )
        h = _norm(
            nodes.join(hsum, nodes["node"] == hsum[src], "left").select(
                "node", F.coalesce("__s", F.lit(0.0)).alias("h")
            ),
            "h",
        )
        if checkpoint_every and (k + 1) % checkpoint_every == 0 and k + 1 < iterations:
            a = a.localCheckpoint(eager=False)
            h = h.localCheckpoint(eager=False)
    return (
        a.join(h, "node")
        .select(
            "node",
            F.round("a", 6).alias("authority"),
            F.round("h", 6).alias("hub"),
        )
    )


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Connected components of the UNDIRECTED link graph: (node,
    component) where component is the minimum node id reachable — the
    canonical label. The web-scale use is dedup-cluster closure (near-
    dup pair lists -> document clusters, same role as minhash_dedup's
    internal clustering but over an arbitrary edge list) and mirror-site
    detection over host-level link exchange.

    Algorithm: min-label propagation with POINTER JUMPING, run to
    fixpoint —

        l_0(v)   = v
        edge step: c(v) = min(l_k(v), min_{(u,v) in sym(E)} l_k(u))
        jump step: l_{k+1}(v) = c(c(v))

    The edge step alone converges in O(diameter) rounds (a path graph
    of 10^6 nodes would need 10^6 rounds); composing each round with
    one pointer-jump (relabel by the label's own label) roughly doubles
    the distance information per round, giving O(log diameter)
    convergence in practice — the same fixpoint pointer-jumping used by
    minhash_dedup's cluster closure (operators/dedup.py). The
    alternative Kiveris et al. 2014 large-star/small-star alternation
    has the same O(log) round bound but rewrites the EDGE table every
    round; this formulation shuffles only the (node, label) vector
    (8+8 bytes) per round and leaves the symmetrized edge table's
    partitioning untouched for reuse across iterations.

    Scale shape per round: one hash join of sym-edges against the label
    vector + one map-side-combinable min aggregate + one label
    self-join (the jump) — labels only, never edge payloads. Lineage is
    cut each round (localCheckpoint). Convergence is detected by
    sum(label) reaching a fixed point: labels are node ids and only
    ever DECREASE, so an unchanged integer sum is exact evidence no
    node changed (one cheap count-style action per round, the minhash
    fixpoint convention).

    Isolated nodes (in ``nodes`` but no edges) keep component = node.
    """
    if nodes is None:
        nodes = (
            edges.select(F.col(src).alias("node"))
            .union(edges.select(F.col(dst).alias("node")))
            .distinct()
        )
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    ).localCheckpoint(eager=False)

    lbl = nodes.select("node", F.col("node").alias("comp"))
    prev_sum = None
    for k in range(max_iterations):
        nbr = (
            sym.join(lbl, sym["a"] == lbl["node"])
            .groupBy("b")
            .agg(F.min("comp").alias("__nbr_min"))
        )
        cand = (
            lbl.join(nbr, lbl["node"] == nbr["b"], "left")
            .select(
                "node",
                F.least(
                    "comp", F.coalesce("__nbr_min", F.col("comp"))
                ).alias("comp"),
            )
        )
        # pointer jump: relabel through the label's own label. Labels
        # are node ids, so every comp value has a row in cand.
        tgt = cand.select(
            F.col("node").alias("__t"), F.col("comp").alias("__tc")
        )
        lbl = cand.join(tgt, cand["comp"] == tgt["__t"]).select(
            "node", F.col("__tc").alias("comp")
        )
        if checkpoint_every and (k + 1) % checkpoint_every == 0:
            lbl = lbl.localCheckpoint(eager=False)
        # decimal(38,0): sum of 10^10 ids up to 10^10 is ~5e19, past
        # int64 — the exactness argument needs overflow-free arithmetic
        cur = lbl.agg(F.sum(F.col("comp").cast("decimal(38,0)"))).collect()[0][0]
        if cur == prev_sum:
            break
        prev_sum = cur
    return lbl.select("node", F.col("comp").alias("component"))


def neighborhood_function(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    radius: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """EXACT truncated neighborhood function + harmonic centrality over
    the directed graph: nf_r(v) = |{u : d(v,u) <= r}| (self included)
    for r = 1..radius, and the radius-truncated harmonic centrality
    h(v) = sum_r (nf_r - nf_{r-1})/r — Boldi & Vigna's centrality of
    choice for web graphs (well-defined on disconnected graphs, unlike
    closeness). This exact variant materializes the reachable-pair set
    (one edge join + union + distinct per radius step), which is
    O(sum of ball sizes) rows — tractable at oracle scale and the
    ground truth ``hyperball`` is tested against; at 10^10 URLs use
    ``hyperball`` (same output shape, HLL registers instead of pair
    sets, memory O(nodes x 2^p) instead of O(nodes x ball)).

    harmonic is computed row-wise from the final integer counts in one
    fixed-order double expression (round 6 dp) — deterministic and
    SQL-replayable, never an engine-order float aggregation.
    """
    if radius < 1:
        raise ValueError("neighborhood_function: radius must be >= 1")
    if nodes is None:
        nodes = (
            edges.select(F.col(src).alias("node"))
            .union(edges.select(F.col(dst).alias("node")))
            .distinct()
        )
    e = edges.select(F.col(src).alias("__es"), F.col(dst).alias("__ed")).distinct()
    cur = nodes.select(F.col("node").alias("__v"), F.col("node").alias("__u"))
    out = nodes
    for r in range(1, radius + 1):
        step = cur.join(e, cur["__u"] == e["__es"]).select(
            "__v", F.col("__ed").alias("__u")
        )
        cur = cur.union(step).distinct().localCheckpoint(eager=False)
        nf = cur.groupBy("__v").agg(F.count(F.lit(1)).alias(f"nf{r}"))
        out = out.join(nf, out["node"] == nf["__v"], "left").drop("__v")
        out = out.withColumn(f"nf{r}", F.coalesce(f"nf{r}", F.lit(1)))
    harm = F.lit(0.0)
    for r in range(1, radius + 1):
        prev = F.lit(1) if r == 1 else F.col(f"nf{r-1}")
        harm = harm + (F.col(f"nf{r}") - prev).cast("double") / F.lit(float(r))
    return out.select(
        "node", *[f"nf{r}" for r in range(1, radius + 1)],
        F.round(harm, 6).alias("harmonic"),
    )


def hyperball(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    radius: int = 4,
    p: int = 6,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 1,
) -> DataFrame:
    """HyperBall (Boldi & Vigna 2013): the approximate neighborhood
    function at web scale. Each node carries an HLL sketch (m = 2^p
    byte registers) of its out-ball; one radius step merges every
    node's sketch with its successors' by element-wise register max:

        B_0(v)   = sketch({v})
        B_{r+1}(v) = regmax( B_r(v), B_r(w) for (v,w) in E )

    and nf_r(v) is the standard HLL estimate (alpha_m * m^2 / sum
    2^-M_j, linear-counting correction below 2.5m) of |ball(v, r)|.

    Entirely column algebra — no Python in the loop: the register
    array is built from xxhash64(node) (index = low p bits, rho =
    leading-zero rank of an independent hash), the merge is one edge
    join + m per-register max aggregates (map-side combinable) + one
    zip_with against the node's own sketch, and the estimate is one
    F.aggregate fold. Per step the shuffle carries (node, m bytes) —
    at p=6 that is 64 bytes/node vs the exact variant's full pair set;
    this is what makes the neighborhood function computable at 10^10
    nodes (the HyperBall paper ran a 3.5B-node crawl on one machine).
    Relative standard error ~= 1.04/sqrt(m) (13% at p=6) per count.

    Returns (node, anf1..anfR) DOUBLE estimates; pytest bounds their
    mean relative error against ``neighborhood_function``.
    """
    if radius < 1:
        raise ValueError("hyperball: radius must be >= 1")
    if not 4 <= p <= 12:
        raise ValueError("hyperball: p must be in [4, 12]")
    m = 1 << p
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    if nodes is None:
        nodes = (
            edges.select(F.col(src).alias("node"))
            .union(edges.select(F.col(dst).alias("node")))
            .distinct()
        )
    e = edges.select(F.col(src).alias("__es"), F.col(dst).alias("__ed")).distinct()

    idx = F.pmod(F.xxhash64("node", F.lit("hb-idx")), F.lit(m))
    w32 = F.pmod(F.xxhash64("node", F.lit("hb-val")), F.lit(1 << 32)) + F.lit(1)
    # rho = leading-zero count of the 32-bit value + 1 = 32 - floor(log2(w)):
    # w = 2^31 (MSB set) -> rho 1, w = 1 -> rho 32. P(rho = r) = 2^-r, the
    # HLL register distribution (an off-by-one here doubles every raw
    # estimate — regression-tested by the dense-ball test, which exercises
    # the raw branch, not just linear counting).
    rho = (F.lit(32) - F.floor(F.log2(w32.cast("double")))).cast("int")
    sk = nodes.select(
        "node",
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda i: F.when(i == idx, rho).otherwise(F.lit(0)),
        ).alias("__regs"),
    )

    def _estimate(regs: "F.Column") -> "F.Column":
        inv = F.aggregate(
            regs, F.lit(0.0), lambda acc, r: acc + F.pow(F.lit(2.0), -r.cast("double"))
        )
        zeros = F.size(F.filter(regs, lambda r: r == 0))
        raw = F.lit(alpha * m * m) / inv
        lin = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
        return F.round(
            F.when((raw <= F.lit(2.5 * m)) & (zeros > 0), lin).otherwise(raw), 3
        )

    out = nodes
    for r in range(1, radius + 1):
        succ = (
            e.join(sk, e["__ed"] == sk["node"])
            .groupBy("__es")
            .agg(*[F.max(F.col("__regs")[i]).alias(f"__m{i}") for i in range(m)])
            .select("__es", F.array(*[f"__m{i}" for i in range(m)]).alias("__sregs"))
        )
        sk = (
            sk.join(succ, sk["node"] == succ["__es"], "left")
            .select(
                "node",
                F.when(
                    F.col("__sregs").isNull(), F.col("__regs")
                ).otherwise(
                    F.zip_with("__regs", "__sregs", lambda a, b: F.greatest(a, b))
                ).alias("__regs"),
            )
        )
        if checkpoint_every and r % checkpoint_every == 0:
            sk = sk.localCheckpoint(eager=False)
        est = sk.select("node", _estimate(F.col("__regs")).alias(f"anf{r}"))
        out = out.join(est, "node")
    return out.select("node", *[f"anf{r}" for r in range(1, radius + 1)])


def domain_graph(
    edges: DataFrame,
    node_domains: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    domain_col: str = "domain",
) -> DataFrame:
    """Collapse a page-level link graph to registrable-domain level — the
    rollup crawl schedulers and spam analyses run on (domain-level
    PageRank feeds, link-farm reciprocity, intra-domain nav noise):
    every page edge maps through (node -> domain), parallel edges
    collapse into a weight, and each domain gets one row of degree/
    weight/insularity stats.

    100 TB shape: two 8-byte-keyed shuffle joins map endpoints to
    domains (the mapping table is O(pages) — never broadcast), then one
    hash aggregate per direction on O(domains) keys; page identifiers
    and hostnames never ride the aggregates. ``intra_frac`` (share of a
    domain's out-weight pointing at itself) is the nav-vs-content
    signal; domains with out_domains==1 and intra_frac==1 are link
    islands.

    Output: (domain, out_w, in_w, intra_w, out_domains, in_domains,
    intra_frac 6dp) — out_domains/in_domains count DISTINCT counterpart
    domains, self excluded.
    """
    sdom = node_domains.select(
        F.col(node_col).alias(src), F.col(domain_col).alias("src_dom")
    )
    ddom = node_domains.select(
        F.col(node_col).alias(dst), F.col(domain_col).alias("dst_dom")
    )
    # LEFT joins: a crawl graph always has edges into discovered-but-not-
    # yet-crawled pages with no domain mapping; dropping them would
    # undercount out_w and inflate intra_frac (a domain linking mostly at
    # unmapped externals would read as a link island). They aggregate
    # under an explicit "(unmapped)" bucket instead.
    de = (
        edges.join(sdom, src, "left").join(ddom, dst, "left")
        .select(
            F.coalesce("src_dom", F.lit("(unmapped)")).alias("src_dom"),
            F.coalesce("dst_dom", F.lit("(unmapped)")).alias("dst_dom"),
        )
        .groupBy("src_dom", "dst_dom")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    out = de.groupBy(F.col("src_dom").alias("domain")).agg(
        F.sum("w").alias("out_w"),
        F.sum(F.when(F.col("src_dom") == F.col("dst_dom"), F.col("w")).otherwise(F.lit(0))).alias("intra_w"),
        F.count_distinct(
            F.when(F.col("dst_dom") != F.col("src_dom"), F.col("dst_dom"))
        ).alias("out_domains"),
    )
    inn = de.groupBy(F.col("dst_dom").alias("domain")).agg(
        F.sum("w").alias("in_w"),
        F.count_distinct(
            F.when(F.col("src_dom") != F.col("dst_dom"), F.col("src_dom"))
        ).alias("in_domains"),
    )
    return (
        out.join(inn, "domain", "full_outer")
        .select(
            "domain",
            F.coalesce("out_w", F.lit(0)).alias("out_w"),
            F.coalesce("in_w", F.lit(0)).alias("in_w"),
            F.coalesce("intra_w", F.lit(0)).alias("intra_w"),
            F.coalesce("out_domains", F.lit(0)).alias("out_domains"),
            F.coalesce("in_domains", F.lit(0)).alias("in_domains"),
            F.when(
                F.coalesce("out_w", F.lit(0)) > 0,
                F.round(
                    F.coalesce("intra_w", F.lit(0)).cast("double")
                    / F.col("out_w").cast("double"),
                    6,
                ),
            ).otherwise(F.lit(0.0)).alias("intra_frac"),
        )
    )


def opic(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 3,
    iter_dp: int = 12,
    checkpoint_every: int = 1,
) -> DataFrame:
    """OPIC — On-line Page Importance Computation (Abiteboul, Preda,
    Cobena, WWW 2003) — the crawl-frontier priority signal designed to
    be maintained DURING the crawl, unlike PageRank's offline power
    iteration: every node holds CASH; each round it distributes its
    cash equally to its outlinks (dangling nodes return theirs to a
    virtual root that redistributes uniformly — the paper's virtual
    page, so total cash is conserved exactly), and banks what passed
    through it in HISTORY. Importance estimate = history / total
    history; the frontier fetches highest-cash-plus-history first.

    cash_0 = round(1/N, dp); each round:
        to_root  = sum of dangling cash           (1-row aggregate)
        cash'(v) = round(sum_{(u,v) in E} cash(u)/outdeg(u)
                         + to_root/N, dp)
        hist(v) += cash(v)     (banked BEFORE redistribution)

    Scale shape: identical to pagerank's loop — one join of the
    O(nodes) cash vector against the outdeg-fused edge table + one
    dst-keyed aggregate per round, 8-byte keys; the dangling mass is a
    1-row aggregate broadcast back. Per-round iter_dp rounding keeps
    the sums order-independent (the q36 discipline) so the DuckDB twin
    (q112) replays byte-identically.

    Unlike pagerank (whose new vector derives from the stable ``nodes``
    base, so lineage grows linearly), OPIC's state derives from ITSELF
    twice per round (the history fold + the contrib join) and is read a
    third time by the dangling-mass aggregate — unchecked, the logical
    plan doubles every round (2^rounds analyzer blow-up, measured: 316
    exchanges at rounds=3). So the default here is an EAGER
    localCheckpoint every round: the O(nodes) state materializes once
    per round and all three readers share the checkpointed lineage —
    constant plan size per round, the GraphX/Pregel discipline.

    Output: (node, cash, history, importance) — cash/history 6dp,
    importance = round(history / sum(history), 6).
    """
    if nodes is None:
        nodes = (
            edges.select(F.col(src).alias("node"))
            .union(edges.select(F.col(dst).alias("node")))
            .distinct()
        )
    n = nodes.count()
    outd = edges.groupBy(src).agg(F.count(F.lit(1)).alias("__outdeg"))
    e = edges.select(src, dst).join(outd, src)
    state = nodes.join(
        outd.select(F.col(src).alias("node"), "__outdeg"), "node", "left"
    ).select(
        "node",
        F.coalesce("__outdeg", F.lit(0)).alias("__outdeg"),
        F.round(F.lit(1.0) / F.lit(float(n)), iter_dp).alias("cash"),
        F.lit(0.0).alias("hist"),
    )
    for k in range(rounds):
        root = state.filter(F.col("__outdeg") == 0).agg(
            F.coalesce(F.sum("cash"), F.lit(0.0)).alias("__root")
        )
        contrib = (
            e.join(state.select(F.col("node"), F.col("cash")), e[src] == F.col("node"))
            .groupBy(dst)
            .agg(F.sum(F.col("cash") / F.col("__outdeg")).alias("__s"))
        )
        state = (
            state.join(contrib, state["node"] == contrib[dst], "left")
            .crossJoin(F.broadcast(root))
            .select(
                "node",
                "__outdeg",
                F.round(
                    F.coalesce("__s", F.lit(0.0))
                    + F.col("__root") / F.lit(float(n)),
                    iter_dp,
                ).alias("cash"),
                F.round(F.col("hist") + F.col("cash"), iter_dp).alias("hist"),
            )
        )
        if checkpoint_every and (k + 1) % checkpoint_every == 0 and k + 1 < rounds:
            state = state.localCheckpoint(eager=True)
    tot = state.agg(F.sum("hist").alias("__tot"))
    return (
        state.crossJoin(F.broadcast(tot))
        .select(
            "node",
            F.round("cash", 6).alias("cash"),
            F.round("hist", 6).alias("history"),
            F.round(F.col("hist") / F.col("__tot"), 6).alias("importance"),
        )
    )


def cocitation_pairs(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    degree_cap: int = 20,
    min_shared: int = 2,
    top_k: int = 100,
) -> DataFrame:
    """Co-citation and bibliographic-coupling related-pages (Dean &
    Henzinger, WWW 1999) — the GRAPH-structural mirror/similar-page
    signal complementing KMV's content resemblance (q111): two pages
    co-cited by many of the same sources are related even when their
    text differs (syndication, translated mirrors, product variants).

    - co-citation(a, b)   = |{s : s->a and s->b}|   (shared in-link
      sources; computed by self-joining edges on src)
    - the transpose (bibliographic coupling — shared OUT-links) is the
      same kernel with src/dst swapped; callers pass the swapped
      columns.

    100 TB shape: the self-join explosion is bounded BEFORE the join by
    capping each source's fan-out at a LITERAL ``degree_cap`` (one
    window, WindowGroupLimit pushdown, deterministic dst-asc order —
    a nav-template source linking 10^4 pages would otherwise emit
     10^8 pairs; capped, a source emits at most C(cap,2)). Pair counts
    are one hash aggregate on (a, b); ``min_shared`` floors the output
    and TakeOrderedAndProject takes the global top-k.

    Output: (node_a, node_b, cocite) with node_a < node_b, ordered
    (cocite desc, node_a asc, node_b asc), <= top_k rows.
    """
    w = Window.partitionBy(src).orderBy(F.col(dst).asc())
    capped = (
        edges.select(src, dst)
        .distinct()
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= F.lit(int(degree_cap)))
        .drop("__rn")
    )
    a = capped.select(F.col(src).alias("__s"), F.col(dst).alias("node_a"))
    b = capped.select(F.col(src).alias("__s"), F.col(dst).alias("node_b"))
    pairs = (
        a.join(b, "__s")
        .filter(F.col("node_a") < F.col("node_b"))
        .groupBy("node_a", "node_b")
        .agg(F.count(F.lit(1)).alias("cocite"))
        .filter(F.col("cocite") >= int(min_shared))
    )
    return pairs.orderBy(
        F.col("cocite").desc(), F.col("node_a").asc(), F.col("node_b").asc()
    ).limit(int(top_k))


def resolve_redirects(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_doublings: int = 5,
) -> DataFrame:
    """Redirect-chain resolution over a FUNCTIONAL graph (each URL has
    at most one redirect target — the reference's client follows these
    per request, raven_request.rs redirect handling; at corpus scale
    the chains live in a table and must collapse in bulk): map every
    source URL to the terminal of its redirect chain, so frontier
    admission and the URL-seen set key on the canonical landing URL
    instead of counting every 301 hop as a distinct page.

    Algorithm: POINTER DOUBLING on the mapping itself — after k rounds
    every row maps src to f^(2^k)(src), with terminals absorbing (a
    final URL with no outgoing redirect stays put via the left join's
    coalesce). ``max_doublings`` = K bounds the resolvable chain length
    at H = 2^K hops (default 32 — real redirect chains are < 10; HTTP
    clients cap near 20). Chains that have not terminated after H hops
    are redirect CYCLES (or beyond-limit chains): flagged
    resolved=false with final_url = f^H(src), exactly the node the
    bounded recursive-CTE oracle (q126) lands on — byte parity even on
    the pathological rows.

    Multi-edges per source (same URL captured with different redirect
    targets across rounds) are collapsed deterministically to min(dst)
    BEFORE resolution; pass a latest-capture view for recency-wins
    semantics.

    Scale shape: K self-joins of the O(sources) mapping vector on
    8-byte-ish URL keys — the chain text never re-shuffles, the edge
    table is read once, and lineage is cut per round (localCheckpoint,
    the connected_components discipline). No driver residency.

    Output: (src, final_dst, hops, resolved) — hops = edges traversed
    (= chain length when resolved; = H on cycle rows).
    """
    m = (
        edges.groupBy(F.col(src).alias("s"))
        .agg(F.min(F.col(dst)).alias("d"))
        .filter(F.col("d").isNotNull())
        .localCheckpoint(eager=False)
    )
    cur = m.select("s", "d", F.lit(1).cast("long").alias("hops"))
    for _ in range(int(max_doublings)):
        hop = cur.select(
            F.col("s").alias("__s"), F.col("d").alias("__d"),
            F.col("hops").alias("__h"),
        )
        cur = (
            cur.join(hop, cur["d"] == hop["__s"], "left")
            .select(
                "s",
                F.coalesce("__d", "d").alias("d"),
                (F.col("hops") + F.coalesce("__h", F.lit(0))).alias("hops"),
            )
            .localCheckpoint(eager=False)
        )
    outs = m.select(F.col("s").alias("__o"))
    return (
        cur.join(outs, cur["d"] == outs["__o"], "left")
        .select(
            F.col("s").alias(src),
            F.col("d").alias("final_dst"),
            "hops",
            F.col("__o").isNull().alias("resolved"),
        )
    )


def link_reciprocity(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node link reciprocity — the classic nepotism/link-farm
    signal (mutual-link rings trade edges to inflate each other;
    organic web linking is overwhelmingly one-directional): for every
    node with outlinks, the fraction of its distinct out-edges whose
    REVERSE edge also exists. Feeds the frontier demotion stack next
    to TrustRank spam mass (q104) and trap scores (q50) — a host whose
    outlinks are mostly reciprocated inside a clique earns demotion
    before its PageRank looks organically high.

    Scale shape: one distinct pass over (src, dst), one self-join on
    the swapped 2-key (8-byte ids both sides — a left-semi, so only
    existence crosses, never payloads), one per-src aggregate. No
    windows, no driver state; hot nodes cost their degree, never the
    graph.

    Output: (node, n_out, n_recip, reciprocity 6dp), one row per node
    with >= 1 distinct outlink (self-loops dropped).
    """
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .filter(F.col("s") != F.col("d"))
        .filter(F.col("s").isNotNull() & F.col("d").isNotNull())
        .distinct()
        .localCheckpoint(eager=False)
    )
    rev = e.select(F.col("d").alias("s"), F.col("s").alias("d"))
    mutual = e.join(rev, ["s", "d"], "left_semi")
    deg = e.groupBy("s").agg(F.count(F.lit(1)).alias("n_out"))
    rec = mutual.groupBy("s").agg(F.count(F.lit(1)).alias("n_recip"))
    return (
        deg.join(rec, "s", "left")
        .select(
            F.col("s").alias("node"),
            "n_out",
            F.coalesce("n_recip", F.lit(0)).alias("n_recip"),
            F.round(
                F.coalesce("n_recip", F.lit(0)).cast("double")
                / F.col("n_out").cast("double"),
                6,
            ).alias("reciprocity"),
        )
    )

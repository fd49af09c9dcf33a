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

from pyspark.sql import DataFrame
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

"""Frontier admission — the crawl-side gate that composes every
pre-fetch signal into ONE verdict column, before plan_round ever sees
the delta:

- URL filtering (functions/urls.py::url_filter): domain blocklist with
  subdomain-suffix semantics + URL badword tokens (FineWeb/RefinedWeb
  §3.1's URL-filter stage)
- crawler-trap scoring (functions/urls.py::trap_score_col): Heritrix-
  class heuristics, thresholded
- recrawl due-ness (operators/snapshots.py::recrawl_schedule): a URL
  whose next_fetch_ts lies in the future is not admitted this round

robots gating deliberately stays INSIDE plan_round (it is fetch-time
policy, owned by the host being crawled and joined per round against
the live rules table); admission is crawl-operator policy over the
delta, applied once per URL discovery. Each signal keeps its own
column so a dropped URL's reason is auditable (the clean_corpus
posture), and the composed `admit` is what bootstrap/engine filters
on. Flags-not-splits + one scan: zero shuffles beyond url_filter's
optional distributed-blocklist join and the schedule left join (both
keyed small sides).

The reference crawler admits its whole config-expanded task list
(parser.rs — no discovery, no filtering); this is crawl-tier
task-brief scope composing the session's scale operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from raven_spark.functions.urls import trap_score_col, url_filter


def frontier_admission(
    cand: DataFrame,
    blocked_domains: tuple[str, ...] = (),
    badwords: tuple[str, ...] = (),
    blocked_df: DataFrame | None = None,
    max_trap_score: float | None = None,
    schedule: DataFrame | None = None,
    now_ts=None,
    trap_templates: DataFrame | None = None,
    url_col: str = "url_canon",
    id_col: str = "url_hash",
) -> DataFrame:
    """Adds (blocked_domain, url_badword, trap_score, due, admit) to a
    frontier delta carrying ``url_canon`` (plus ``id_col`` — url_hash,
    as with_url_identity provides — when the distributed ``blocked_df``
    path is used; the literal paths need only the URL).

    ``schedule`` is a (url, next_fetch_ts) table — recrawl_schedule
    output (optionally already least()-blended with the sitemap
    changefreq hint); ``now_ts`` is the round's admission instant
    (column or literal), REQUIRED with ``schedule`` and rejected
    without it (ValueError either way — a missing instant would
    NULL-propagate due-ness into admit, an ignored one would silently
    admit held-back URLs). URLs absent from the schedule are due
    (first fetch); URLs scheduled in the future are held back with
    ``due=false`` — they stay in the frontier for a later round rather
    than dropping.
    """
    out = url_filter(
        cand,
        blocked_domains=blocked_domains,
        badwords=badwords,
        blocked_df=blocked_df,
        url_col=url_col,
        id_col=id_col,
    )
    out = out.withColumn("trap_score", trap_score_col(F.col(url_col)))
    trap_ok = (
        F.lit(True)
        if max_trap_score is None
        else F.col("trap_score") <= F.lit(float(max_trap_score))
    )
    if schedule is not None:
        if now_ts is None:
            # without an admission instant, every scheduled URL's
            # due-ness would NULL-propagate straight into admit
            raise ValueError("frontier_admission: schedule requires now_ts")
        sched = schedule.select(
            F.col("url").alias("__sched_url"),
            F.col("next_fetch_ts").alias("__next_ts"),
        )
        out = out.join(
            sched, out[url_col] == sched["__sched_url"], "left"
        ).drop("__sched_url")
        now = now_ts if isinstance(now_ts, Column) else F.lit(now_ts)
        due = F.col("__next_ts").isNull() | (F.col("__next_ts") <= now)
        out = out.withColumn("due", due).drop("__next_ts")
    else:
        if now_ts is not None:
            # symmetric guard: an instant with no schedule means the
            # caller THINKS due-ness is being enforced — it isn't
            raise ValueError("frontier_admission: now_ts requires schedule")
        out = out.withColumn("due", F.lit(True))
    if trap_templates is not None:
        # population-level trap denial: mine_url_templates' flagged
        # (host, template) clusters, joined against each candidate's OWN
        # computed template — the enforcement half of q93's mining (a
        # per-URL trap_score can't see that /cal/{n}/{n}/{n} has 10^6
        # siblings; the template table can). The deny side is O(flagged
        # templates) — broadcast; swap to a shuffle join if a deployment
        # ever flags more templates than fit a broadcast.
        from raven_spark.functions.urls import template_host_col, url_template_col

        # accept mine_url_templates output directly: when the verdict
        # column is present, only flagged templates deny (passing the
        # raw mining table would otherwise block EVERY template)
        if "trap_suspect" in trap_templates.columns:
            trap_templates = trap_templates.filter(F.col("trap_suspect"))
        host = template_host_col(F.col(url_col))
        tt = trap_templates.select(
            F.col("host").alias("__t_host"),
            F.col("template").alias("__t_tpl"),
            F.lit(True).alias("__t_hit"),
        ).distinct()
        out = (
            out.withColumn("__host", host)
            .withColumn("__tpl", url_template_col(F.col(url_col)))
            .join(
                F.broadcast(tt),
                (F.col("__host") == F.col("__t_host"))
                & (F.col("__tpl") == F.col("__t_tpl")),
                "left",
            )
            .withColumn(
                "template_blocked", F.coalesce(F.col("__t_hit"), F.lit(False))
            )
            .drop("__t_host", "__t_tpl", "__t_hit", "__host", "__tpl")
        )
    else:
        out = out.withColumn("template_blocked", F.lit(False))
    return out.withColumn(
        "admit",
        F.col("url_allowed") & trap_ok & F.col("due")
        & ~F.col("template_blocked"),
    )


def priority_schedule(
    cand: DataFrame,
    importance: DataFrame,
    budgets: DataFrame,
    host_col: str = "host",
    url_col: str = "url_canon",
    node_col: str = "node",
    default_budget: int = 5,
    max_budget: int = 50,
) -> DataFrame:
    """The loop-closing frontier scheduler: composes the engine's three
    priority signals into the per-round fetch list a crawl operator
    actually executes — WHAT to fetch (admitted candidates), in WHAT
    order (OPIC/TrustRank-style page importance, :func:`~raven_spark.
    operators.graph.opic`), and HOW MANY per host (latency-adaptive
    politeness budgets, :func:`~raven_spark.operators.politeness.
    adaptive_host_budget`). Reference scope ends at FIFO frontiers with
    fixed per-host budgets (crawler.rs round loop); this is the
    priority layer the 10^10-URL frontier needs — fetch the highest-
    value pages first under each host's real capacity.

    Semantics: candidates left-join importance on ``node_col``
    (unknown pages rank at 0.0 — discovered-but-never-linked), left-
    join budgets on ``host_col`` (unknown hosts get ``default_budget``),
    then each host keeps its top-``budget`` rows by (priority desc,
    url asc — total order, replayable).

    100 TB shape: the importance join is 8-byte node keys; the budget
    join is O(hosts) (broadcast while small — Spark's planner decides;
    at 10^8 hosts it degrades to a key-partitioned join, never driver
    state). The per-host pick follows the plans/round.py politeness
    discipline (VERDICT r3 #3): ONE window with the LITERAL
    ``max_budget`` rank bound — WindowGroupLimit pushdown, per-
    partition heaps, a Zipf-hot host never full-sorts its slice — then
    the exact non-literal ``budget`` filter on the pruned survivors.
    Deferred rows are the complement (``cand`` anti-join the result);
    callers that need them compute it without forcing this plan to
    rank beyond the literal bound.

    Output: (host, url, node, priority 6dp, fetch_rank), fetch_rank
    1..budget(host), ordered within host by priority desc.
    """
    from pyspark.sql import Window

    imp = importance.select(
        F.col(node_col).alias("__i_node"), F.col("importance").alias("__imp")
    )
    bud = budgets.select(
        F.col(host_col).alias("__b_host"), F.col("budget").alias("__budget")
    )
    joined = (
        cand.join(imp, cand[node_col] == imp["__i_node"], "left")
        .drop("__i_node")
        .join(bud, cand[host_col] == bud["__b_host"], "left")
        .drop("__b_host")
        .select(
            F.col(host_col).alias("host"),
            F.col(url_col).alias("url"),
            F.col(node_col).alias("node"),
            F.round(F.coalesce(F.col("__imp"), F.lit(0.0)), 6).alias("priority"),
            F.coalesce(F.col("__budget"), F.lit(int(default_budget))).alias(
                "__budget"
            ),
        )
    )
    w = Window.partitionBy("host").orderBy(F.col("priority").desc(), F.col("url").asc())
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= F.lit(int(max_budget)))  # literal -> WindowGroupLimit
        .filter(F.col("__rn") <= F.col("__budget"))  # exact budget on survivors
        .select("host", "url", "node", "priority", F.col("__rn").alias("fetch_rank"))
    )

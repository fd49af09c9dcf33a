"""Inspect physical plans of the hot-path operators (the brief's
".explain and iterate" loop). Checks, per plan:

- parquet scans carry PushedFilters / narrow ReadSchema (pruning works)
- dim joins choose BroadcastHashJoin (no shuffle of the fact side)
- the exact anti-join on url_hash stays a narrow-key join
- WholeStageCodegen spans cover the column-algebra kernels

Usage: python tools/explain_plans.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")


def summarize(tag: str, df, checks: dict[str, str]) -> None:
    import contextlib
    import io

    try:
        df.count()  # finalize AQE so codegen ids/final joins are visible
    except Exception:
        pass
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    print(f"\n===== {tag} =====")
    scans = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    reads = re.findall(r"ReadSchema: ([^\n]*)", plan)
    joins = re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin)", plan)
    exchanges = plan.count("Exchange")
    codegen = len(set(re.findall(r"codegen id : (\d+)", plan)))
    print(f"joins={joins} exchanges={exchanges} codegen_spans={codegen}")
    for s in scans[:4]:
        print(f"  PushedFilters: [{s[:100]}]")
    for s in reads[:4]:
        print(f"  ReadSchema: {s[:120]}")
    for label, pattern in checks.items():
        ok = re.search(pattern, plan) is not None
        print(f"  CHECK {label}: {'OK' if ok else 'MISSING'}")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as em
    from raven_spark.session import get_spark

    spark = get_spark("explain", cpus=8)

    summarize(
        "q01 pricing summary (scan+agg)",
        em.q01_pricing_summary(spark, sf_dir),
        {
            "filter pushed to scan": r"PushedFilters: \[.*LessThanOrEqual",
            "partial agg (map-side combine)": r"HashAggregate",
        },
    )
    summarize(
        "q02 revenue by nation (joins)",
        em.q02_revenue_by_nation(spark, sf_dir),
        {"dims broadcast": r"BroadcastHashJoin", "fact scan pruned": r"ReadSchema:.*l_extendedprice"},
    )
    summarize(
        "q05 anti-join",
        em.q05_customers_without_orders(spark, sf_dir),
        {"anti join": r"LeftAnti", "orders scan key-only": r"ReadSchema: struct<o_custkey"},
    )
    summarize(
        "q17 url_seen subtract (bloom + anti)",
        em.q17_url_seen_subtract(spark, sf_dir),
        {"anti join": r"LeftAnti"},
    )
    summarize(
        "q09 exact dedup",
        em.q09_exact_dedup(spark, sf_dir),
        {"partial agg": r"HashAggregate", "scan 2 cols only": r"ReadSchema: struct<doc_id:bigint,text:string"},
    )

    summarize(
        "q33 star join + windowed top-k",
        em.q33_brand_revenue_by_nation(spark, sf_dir),
        {
            "three broadcast dims": r"BroadcastHashJoin[\s\S]*BroadcastHashJoin[\s\S]*BroadcastHashJoin",
            "partial agg before shuffle": r"HashAggregate",
            "window rank": r"Window",
            "fact scan pruned": r"ReadSchema:.*l_extendedprice",
        },
    )
    summarize(
        "q32 clean_corpus (composed verdict)",
        em.q32_clean_corpus(spark, sf_dir),
        {
            "single scan": r"Scan parquet",
            "one window (canonical id)": r"Window",
            "no python in plan": r"^(?![\s\S]*(ArrowEvalPython|BatchEvalPython))",
        },
    )
    summarize(
        "q30 hash split (pure codegen)",
        em.q30_hash_split(spark, sf_dir),
        {
            "id-only scan": r"ReadSchema: struct<doc_id:bigint>",
            "no exchange at all": r"^(?![\s\S]*Exchange)",
        },
    )

    summarize(
        "q39 cuckoo subtract (staged: filter build/delete checkpointed once)",
        em.q39_url_seen_cuckoo(spark, sf_dir),
        {
            "anti join": r"LeftAnti",
            "no whole-filter broadcast of shards": r"^(?![\s\S]*BroadcastExchange[\s\S]*cuckoo)",
        },
    )
    summarize(
        "q40 as-of join (union + window, no join node)",
        em.q40_asof_join(spark, sf_dir),
        {
            "single window": r"Window",
            "no pairwise join": r"^(?![\s\S]*(SortMergeJoin|BroadcastHashJoin))",
            "pushed event_type filters": r"PushedFilters: \[.*event_type",
        },
    )
    summarize(
        "q41 stratified sample+cap (zero-shuffle filter, top-k pushdown)",
        em.q41_stratified_sample(spark, sf_dir),
        {
            "map-side WindowGroupLimit": r"WindowGroupLimit",
            # one physical Exchange node: its "(n) Exchange" detail header
            # appears once (tree + detail would double-count plain "Exchange")
            "exactly one exchange": r"^(?:(?!\(\d+\) Exchange)[\s\S])*\(\d+\) Exchange(?:(?!\(\d+\) Exchange)[\s\S])*$",
        },
    )
    summarize(
        "q46 sequence packing (bucketed running sum)",
        em.q46_pack_chunks(spark, sf_dir),
        {
            "one window": r"Window",
            "no python": r"^(?![\s\S]*(ArrowEvalPython|BatchEvalPython))",
        },
    )

    # frontier round plan (the engine hot path)
    from raven_spark.config import RavenConfig, RavenRequest
    from raven_spark.operators.fetch import SyntheticFetcher
    from raven_spark.plans.round import frontier_from_urls, plan_round
    from raven_spark.sources.corpus import generate_pages, seed_urls

    corpus = generate_pages(spark, 1000, seed=42)
    frontier = frontier_from_urls(spark, seed_urls(100, 1000))
    plan = plan_round(
        frontier, None, SyntheticFetcher(corpus), 0, host_budget=10, shuffle_partitions=8
    )
    summarize(
        "crawl round (politeness window + fetch join)",
        plan.results,
        {
            "window per host": r"Window",
            "arrow fetch stage": r"(MapInPandas|ArrowEvalPython|FlatMapGroupsInPandas)",
        },
    )
    spark.stop()


if __name__ == "__main__":
    main()

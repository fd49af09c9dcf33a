"""``python -m raven_spark run config.yaml`` — the config-driven CLI, the
direct analogue of the reference binary (``raven config.yaml``,
main.rs:15-38 -> runner.rs:25-81):

    python -m raven_spark run config.yaml --state /path/state \
        [--corpus pages.parquet]   # deterministic synthetic "network"
        [--http]                   # real HTTP via urllib
        [--cpus N] [--max-rounds K]

Lifecycle parity: strict config parse (T1) -> task expansion on the
cluster (T2-T8, tasks carried per-row) -> engine rounds (fetch/retry/
charset/persist, F*/C*/P*) -> run summary printed as one JSON line and
logged (S1/M4, runner.rs:113-155). Config output sinks fan out through
catalog_for_sink (P1: local_file/parquet/s3 -> extra pages sinks).
"""

from __future__ import annotations

import argparse
import json
import logging
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="raven_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    run = sub.add_parser("run", help="run a crawl from a YAML config")
    run.add_argument("config", help="YAML config path (reference schema)")
    run.add_argument("--state", required=True, help="state root (path or file:/ / s3a:// URI)")
    run.add_argument("--corpus", help="synthetic corpus parquet (deterministic fetcher)")
    run.add_argument("--http", action="store_true", help="fetch over real HTTP (urllib)")
    run.add_argument("--cpus", type=int, default=None)
    run.add_argument("--max-rounds", type=int, default=None)
    run.add_argument("--robots", action="store_true",
                     help="fetch + honor robots.txt per host (HTTP mode); "
                          "rules are fetched for seed hosts before round 0 "
                          "and refreshed each round for newly discovered hosts")
    run.add_argument("--compact-every", type=int, default=64, metavar="N",
                     help="fold per-round state deltas into segments every "
                          "N rounds (0 disables); long crawls otherwise "
                          "re-list O(rounds) delta dirs per round")
    run.add_argument("--sitemaps", action="store_true",
                     help="with --robots: follow robots.txt Sitemap: "
                          "pointers (one sitemapindex level) and seed the "
                          "declared pages into round 0's frontier")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from raven_spark.config import parse_config
    from raven_spark.engine import CrawlEngine, EngineOptions
    from raven_spark.session import get_spark
    from raven_spark.sources.catalog import catalog_for_sink

    with open(args.config) as f:
        config = parse_config(f.read())

    # only stop a session this CLI itself created (tests and notebooks
    # pass through with their own active session)
    pre_existing = SparkSession.getActiveSession() is not None
    spark = get_spark(f"raven_spark:{config.name}", cpus=args.cpus)
    try:
        if args.http:
            from raven_spark.operators.http import http_fetcher_for

            fetcher = http_fetcher_for(config)
        elif args.corpus:
            from raven_spark.operators.fetch import SyntheticFetcher

            fetcher = SyntheticFetcher(spark.read.parquet(args.corpus), seed=42)
        else:
            p.error("one of --corpus or --http is required")
        extra_sinks = [catalog_for_sink(spark, m) for m in config.sinks]
        from datetime import datetime, timezone

        run_ts = datetime.now(timezone.utc)
        robots_fetcher = None
        if args.robots:
            if not args.http:
                p.error("--robots requires --http (robots.txt is fetched over the network)")
            from raven_spark.operators.politeness import fetch_robots

            # handed to the engine as a FETCHER, not a pre-built table: the
            # engine materializes rules once per host (never re-fetched per
            # round-plan lineage) and extends coverage to link-discovered
            # hosts before they are ever scheduled
            def robots_fetcher(hosts_df):
                return fetch_robots(hosts_df, timeout_s=config.request.timeout_s)
        if args.sitemaps and not args.robots:
            p.error("--sitemaps requires --robots (pointers come from robots.txt)")
        prefetched_rules = None
        if args.sitemaps:
            # fetch seed-host robots ONCE: the lazy rules pipeline goes to
            # the engine, whose catalog append is the single materializing
            # action; the table is then read BACK for the sitemap pointers
            # — so neither the engine's round-0 refresh nor the pointer
            # derivation re-fetches a host's robots.txt, and no rule row
            # ever lands on the driver
            from raven_spark.expansion import tasks_df
            from raven_spark.plans.round import frontier_from_tasks

            seeds = frontier_from_tasks(
                tasks_df(spark, config, run_ts), round_no=0,
                salt_buckets=config.salt_buckets,
            )
            prefetched_rules = robots_fetcher(seeds.select("host").distinct())
        eng = CrawlEngine(
            spark, config, args.state, fetcher, robots=prefetched_rules,
            options=EngineOptions(
                extra_sinks=extra_sinks, robots_fetcher=robots_fetcher,
                compact_every=args.compact_every or None,
            ),
        )
        extra_urls_df = None
        if args.sitemaps:
            # sitemap pointers -> declared pages, end-to-end distributed:
            # a real sitemapindex (50k sitemaps x 50k locs) stays on the
            # executors and unions into frontier Δ(0) as a DataFrame
            from pyspark.sql import functions as F

            from raven_spark.operators.sitemaps import discover_sitemap_pages

            pointers = (
                eng.table("robots")
                .select(F.explode("sitemaps").alias("url"))
                .distinct()
            )
            # salt_buckets must match the config: the fetch stage's
            # host-local politeness relies on every row of a host landing
            # in the same salt bucket as the config-expanded/link paths
            extra_urls_df = discover_sitemap_pages(
                pointers, timeout_s=config.request.timeout_s,
                salt_buckets=config.salt_buckets,
            )
        eng.bootstrap_from_config(run_ts=run_ts, extra_urls_df=extra_urls_df)
        stats = eng.run(max_rounds=args.max_rounds)
        summary = {
            "name": config.name,
            "rounds": len(stats),
            "tasks": sum(s.get("tasks", 0) for s in stats),
            "failed": sum(s.get("failed", 0) for s in stats),
            "persist_errors": [e for s in stats for e in s.get("persist_errors", [])],
            "wall_s": round(sum(s.get("round_wall_s", 0.0) for s in stats), 3),
        }
        print(json.dumps(summary))
        return 0
    finally:
        if not pre_existing:
            spark.stop()


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO, stream=sys.stderr)
    sys.exit(main())

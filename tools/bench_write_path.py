"""Write-path experiment harness (VERDICT r1 #8: pages_write is ~87% of
round wall at local[16]).

Runs ONE crawl (2 rounds, bench corpus/seeds) per variant in a fresh
subprocess JVM and reports round phase timings, isolating:

- compute-only cost (results.count() instead of the pages write)
- parquet codec choice for the body-dominated pages table
  (snappy / lz4 / zstd / uncompressed)

Usage:
    python tools/bench_write_path.py            # all variants at local[16]
    python tools/bench_write_path.py --child <variant> <cpus>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CORPUS_CACHE = os.environ.get(
    "RAVEN_BENCH_CORPUS", "/tmp/raven_bench_corpus_220000_f50"
)
CRAWL_PAGES = 220000
CRAWL_SEEDS = 100000

VARIANTS = ["count_only", "snappy", "lz4", "zstd", "uncompressed"]
# round-3 A/B: html/text/links values are unique per row — parquet's
# dictionary encoding builds + abandons a dictionary per column chunk
# before falling back to plain; measure the encode tax of that.
VARIANTS += ["zstd_nodict"]
# round-4 A/B (VERDICT r3 #5): writer-side levers on the pages append —
# row-group size (writer buffering + scan granularity), maxRecordsPerFile
# (file splitting within a task), and the output-partition count of the
# write (parallel writer tasks; parts_* also resizes the round's shuffle,
# noted in BASELINE.md). Baseline for these = "zstd" (the session
# default codec path).
VARIANTS += ["rowgroup_16mb", "rowgroup_64mb", "maxrec_50k", "parts_2x", "parts_half"]


def child(variant: str, cpus: int) -> None:
    import shutil
    import tempfile

    from raven_spark.config import RavenConfig, RavenRequest
    from raven_spark.engine import CrawlEngine, EngineOptions
    from raven_spark.operators.fetch import SyntheticFetcher
    from raven_spark.session import get_spark
    from raven_spark.sources.corpus import seed_urls

    extra = {}
    write_parts = cpus
    if variant in ("snappy", "lz4", "zstd"):
        extra["spark.sql.parquet.compression.codec"] = variant
    elif variant == "uncompressed":
        extra["spark.sql.parquet.compression.codec"] = "uncompressed"
    elif variant == "zstd_nodict":
        extra["spark.sql.parquet.compression.codec"] = "zstd"
        extra["spark.hadoop.parquet.enable.dictionary"] = "false"
    elif variant == "rowgroup_16mb":
        extra["spark.hadoop.parquet.block.size"] = str(16 * 1024 * 1024)
    elif variant == "rowgroup_64mb":
        extra["spark.hadoop.parquet.block.size"] = str(64 * 1024 * 1024)
    elif variant == "maxrec_50k":
        extra["spark.sql.files.maxRecordsPerFile"] = "50000"
    elif variant == "parts_2x":
        write_parts = cpus * 2
    elif variant == "parts_half":
        write_parts = max(1, cpus // 2)

    spark = get_spark(f"wp_{variant}", cpus=cpus, shuffle_partitions=cpus, extra_conf=extra)
    corpus = spark.read.parquet(CORPUS_CACHE)
    cfg = RavenConfig(
        name="wp",
        request=RavenRequest(url="https://x/", max_retry=1),
        host_budget_per_round=1_000_000,
        max_rounds=2,
    )
    seeds = seed_urls(CRAWL_SEEDS, CRAWL_PAGES, seed=42)
    fetcher = SyntheticFetcher(corpus, seed=42)
    state = tempfile.mkdtemp(prefix=f"wp_{variant}_")
    try:
        eng = CrawlEngine(
            spark, cfg, state, fetcher,
            options=EngineOptions(expected_total_urls=1 << 20, shuffle_partitions=write_parts),
        )
        if variant == "count_only":
            # compute-only: execute the round pipeline without any write
            from raven_spark.plans.round import frontier_from_urls, plan_round

            f0 = frontier_from_urls(spark, seeds, round_no=0, salt_buckets=256)
            t0 = time.time()
            plan = plan_round(f0, None, fetcher, 0, host_budget=1_000_000,
                              shuffle_partitions=cpus, max_retry=1)
            n = plan.results.count()
            dt = time.time() - t0
            for df in plan.cached or []:
                df.unpersist()
            print(json.dumps({"variant": variant, "cpus": cpus,
                              "round0_compute_s": round(dt, 2), "rows": n}))
            return
        t0 = time.time()
        stats = eng.run(seed_urls=seeds, max_rounds=2)
        wall = time.time() - t0
        size = subprocess.run(["du", "-sb", os.path.join(state, "pages")],
                              capture_output=True, text=True).stdout.split()[0]
        print(json.dumps({
            "variant": variant, "cpus": cpus, "wall_s": round(wall, 2),
            "pages_bytes": int(size),
            "rounds": [{"wall_s": s["round_wall_s"], "phases": s["phase_ms"]}
                       for s in stats],
        }))
    finally:
        shutil.rmtree(state, ignore_errors=True)
        spark.stop()


def main() -> None:
    if len(sys.argv) > 3 and sys.argv[1] == "--child":
        child(sys.argv[2], int(sys.argv[3]))
        return
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    variants = sys.argv[2].split(",") if len(sys.argv) > 2 else VARIANTS
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    for v in variants:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", v, str(cpus)],
            capture_output=True, text=True, env=env, timeout=1800,
        )
        lines = [ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")]
        print(lines[-1] if lines else f'{{"variant": "{v}", "error": {json.dumps(proc.stderr[-400:])}}}')


if __name__ == "__main__":
    main()

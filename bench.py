"""bench.py — headline benchmark for the driver (one JSON line on stdout).

Two parts:

1. headline queries (oracle-checked operators) timed at
   $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
   local[$SPARK_GRAFT_CPUS].
2. crawl throughput + the BASELINE.json north_rule scaling evidence: the
   SAME multi-round crawl over the same synthetic corpus run at local[8]
   and local[32] (the sandbox proxy for N vs 4N executors), reporting
   URLs fetched+deduped/sec at each level and the scaling efficiency
   thr(4N) / (4 * thr(N)).

Each parallelism level runs in its own subprocess (its own JVM) so the
two measurements can't share executor state; JVM startup is excluded
from the timed window (we time engine rounds only).

Output: {"metric": "urls_fetched_deduped_per_sec", "value": <thr@32>,
"unit": "urls/sec", "queries": {name: sec}, "sf": 0.1,
"scaling": {...}, "suite_seconds": ...}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "q01_pricing_summary",
    "q02_revenue_by_nation",
    "q03_top_events_per_user",
    "q04_running_value",
    "q08_date_rollup",
    "q09_exact_dedup",
    "q11_lang_id",
    "q13_token_counts",
    "q14_fingerprint",
    "q15_url_canonicalize",
    "q17_url_seen_subtract",
    "q18_ann_topk",
    "q20_multimodal_roundtrip",
]

CRAWL_PAGES = int(os.environ.get("RAVEN_BENCH_PAGES", "30000"))
CRAWL_SEEDS = int(os.environ.get("RAVEN_BENCH_SEEDS", "4000"))
CRAWL_ROUNDS = 2
CORPUS_CACHE = f"/tmp/raven_bench_corpus_{CRAWL_PAGES}"


def _sf_value(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def run_headline() -> dict[str, float]:
    import __spark_entry__ as entrymod
    from raven_spark.session import get_spark

    spark = get_spark("bench", cpus=CPUS)
    qs = entrymod.queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        df = fn(spark, SF_DIR)  # build (untimed) once to amortize py4j setup
        t0 = time.time()
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)
    spark.stop()
    return timings


def crawl_child(cpus: int) -> None:
    """Child mode: run the crawl at local[cpus], print one JSON line."""
    from pyspark.sql import functions as F

    from raven_spark.config import RavenConfig, RavenRequest
    from raven_spark.engine import CrawlEngine, EngineOptions
    from raven_spark.operators.fetch import SyntheticFetcher
    from raven_spark.session import get_spark
    from raven_spark.sources.corpus import generate_pages, seed_urls

    import shutil
    import tempfile

    spark = get_spark(f"bench_crawl_{cpus}", cpus=cpus, shuffle_partitions=max(cpus, 8))
    if not os.path.exists(CORPUS_CACHE):
        generate_pages(spark, CRAWL_PAGES, seed=42).write.mode("overwrite").parquet(CORPUS_CACHE)
    corpus = spark.read.parquet(CORPUS_CACHE)

    cfg = RavenConfig(
        name="bench",
        request=RavenRequest(url="https://x/", max_retry=1),
        host_budget_per_round=1_000_000,
        max_rounds=CRAWL_ROUNDS,
    )
    state = tempfile.mkdtemp(prefix=f"raven_bench_{cpus}_")
    try:
        eng = CrawlEngine(
            spark, cfg, state, SyntheticFetcher(corpus, seed=42),
            options=EngineOptions(expected_total_urls=1 << 20, shuffle_partitions=max(cpus, 8)),
        )
        seeds = seed_urls(CRAWL_SEEDS, CRAWL_PAGES, seed=42)
        t0 = time.time()
        stats = eng.run(seed_urls=seeds, max_rounds=CRAWL_ROUNDS)
        wall = time.time() - t0
        urls = int(eng.table("pages").count())
        seen = int(eng.table("url_seen").select("url_hash").distinct().count())
        print(json.dumps({"cpus": cpus, "urls": urls, "seen": seen,
                          "wall_s": round(wall, 3),
                          "urls_per_sec": round(urls / wall, 3),
                          "rounds": [s["tasks"] for s in stats]}))
    finally:
        shutil.rmtree(state, ignore_errors=True)
        spark.stop()


def run_scaling() -> dict:
    out = {}
    for cpus in (8, 32):
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--crawl-child", str(cpus)],
            capture_output=True, text=True, env=env, timeout=3600,
        )
        line = [ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")][-1]
        out[f"local[{cpus}]"] = json.loads(line)
        print(f"# crawl local[{cpus}]: {line}", file=sys.stderr)
    thr8 = out["local[8]"]["urls_per_sec"]
    thr32 = out["local[32]"]["urls_per_sec"]
    out["scaling_efficiency_8_to_32"] = round(thr32 / (4 * thr8), 4) if thr8 else None
    return out


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--crawl-child":
        crawl_child(int(sys.argv[2]))
        return
    skip_scaling = os.environ.get("RAVEN_BENCH_SKIP_SCALING") == "1"
    t0 = time.time()
    timings = run_headline()
    scaling = {} if skip_scaling else run_scaling()
    thr = scaling.get("local[32]", {}).get("urls_per_sec", 0.0)
    result = {
        "metric": "urls_fetched_deduped_per_sec",
        "value": thr,
        "unit": "urls/sec",
        "queries": timings,
        "sf": _sf_value(SF_DIR),
        "suite_seconds": round(sum(timings.values()), 3),
        "scaling": scaling,
        "cpus": CPUS,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

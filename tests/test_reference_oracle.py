"""Crawl-order oracle: the distributed engine must reproduce the
single-process reference crawler exactly — crawl order (canonical tuple),
final URL-seen set, result-code per url, and byte-identical text.
This is the BASELINE.json metric's correctness gate, executable."""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo/tools")

from reference_crawler import crawl_reference  # noqa: E402

from raven_spark.config import RavenConfig, RavenRequest
from raven_spark.engine import CrawlEngine, EngineOptions
from raven_spark.operators.fetch import SyntheticFetcher
from raven_spark.sources.corpus import generate_pages, seed_urls

N = 400
BUDGET = 20
ROUNDS = 3


import pytest


@pytest.mark.parametrize("partitions", [3, 8])
def test_engine_matches_reference_crawler(spark, tmp_path, partitions):
    """Parametrized over partition counts: the crawl order must be
    IDENTICAL regardless of parallelism (determinism under partitioning —
    the north_rule's 'identical crawl order' at any cluster size)."""
    corpus = generate_pages(spark, N, seed=42).persist()
    fetcher = SyntheticFetcher(corpus, seed=42)
    seeds = seed_urls(25, N, seed=42)

    # --- reference run (sequential python) -------------------------------
    rows = [(r["url"], bytes(r["html"]), r["charset"])
            for r in corpus.select("url", "html", "charset").collect()]
    ref = crawl_reference(
        rows, seeds, host_budget=BUDGET, max_rounds=ROUNDS,
        max_retry=1, behavior_fn=fetcher.make_behavior(),
    )

    # --- engine run ------------------------------------------------------
    cfg = RavenConfig(
        name="oracle",
        request=RavenRequest(url="https://ignored/", max_retry=1),
        host_budget_per_round=BUDGET,
        max_rounds=ROUNDS,
    )
    eng = CrawlEngine(
        spark, cfg, str(tmp_path / "s"), fetcher,
        options=EngineOptions(expected_total_urls=8192, shuffle_partitions=partitions),
    )
    eng.run(seed_urls=seeds, max_rounds=ROUNDS)
    pages = eng.table("pages")

    # 1. URL-seen set identical
    eng_seen = {r["url_hash"] for r in eng.table("url_seen").select("url_hash").collect()}
    assert eng_seen == ref.url_seen

    # 2. crawl ORDER identical: the canonical tuple of every fetched row
    eng_order = sorted(
        (r["round"], r["priority"], r["host_hash"], r["host_rank"], r["url_canon"])
        for r in pages.select("round", "priority", "host_hash", "host_rank", "url_canon").collect()
    )
    assert eng_order == sorted(ref.crawl_order)

    # 3. result codes identical per url
    eng_codes = {r["url_canon"]: r["result_code"]
                 for r in pages.select("url_canon", "result_code").collect()}
    assert eng_codes == ref.codes

    # 4. byte-identical extracted text per url
    eng_text = {r["url"]: r["text"] for r in eng.table("text").select("url", "text").collect()}
    assert eng_text == ref.text
    corpus.unpersist()

"""Config-driven runs end-to-end: the reference lifecycle
(main.rs:15-38 -> config.rs:46-100 -> runner.rs:25-81) on Spark —
task expansion seeds the frontier with per-row request fields, the fetch
stage honors them per task, sinks fan out from the config, and the
``python -m raven_spark run`` CLI ties it together.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from raven_spark.config import parse_config
from raven_spark.engine import CrawlEngine, EngineOptions
from raven_spark.operators.http import HttpFetcher


def test_engine_post_config_end_to_end(spark, tmp_path):
    """A POST config expands vars x params into tasks whose body_params
    ride the frontier into the HTTP stage (T8 + F4 full path,
    crawler.rs:49). The opener runs in a worker process, so it verifies
    the contract itself and 500s on violation."""
    cfg = parse_config({
        "name": "post-run",
        "request": {
            "url": "https://api.example/{{entity}}/submit",
            "method": "POST",
            "vars": [{"entity": ["a", "b"]}],
            "params": [{"mode": ["fast", "slow"], "tag": ["x y"]}],
        },
        "max_rounds": 1,
    })

    def opener(url, method="GET", headers=None, body=None, timeout_s=1):
        ok = (
            method == "POST"
            and body in (b"mode=fast&tag=x+y", b"mode=slow&tag=x+y")
            and (headers or {}).get("Content-Type") == "application/x-www-form-urlencoded"
        )
        return (200 if ok else 500), {}, b"<p>done</p>", "text/html; charset=utf-8"

    eng = CrawlEngine(
        spark, cfg, str(tmp_path / "s"), HttpFetcher(opener=opener),
        options=EngineOptions(expected_total_urls=1024, shuffle_partitions=4),
    )
    eng.bootstrap_from_config()
    stats = eng.run(max_rounds=1)
    # 2 entities x (2 modes x 1 tag) = 4 tasks
    assert stats[0]["tasks"] == 4
    pages = eng.table("pages")
    rows = pages.collect()
    assert all(r["result_code"] == 200 for r in rows), [
        (r["url_canon"], r["error_detail"]) for r in rows
    ]
    assert all(r["method"] == "POST" for r in rows)
    assert {tuple(sorted(r["body_params"].items())) for r in rows} == {
        (("mode", "fast"), ("tag", "x y")),
        (("mode", "slow"), ("tag", "x y")),
    }


def test_engine_get_config_query_strings(spark, tmp_path):
    """GET configs put params into the canonical sorted query string; the
    opener asserts the exact URL form (F1 determinism, §2.1)."""
    cfg = parse_config({
        "name": "get-run",
        "request": {
            "url": "https://api.example/items",
            "method": "GET",
            "params": [{"offset": ["0", "10"], "limit": ["5"]}],
        },
        "max_rounds": 1,
    })

    def opener(url, method="GET", headers=None, body=None, timeout_s=1):
        ok = method == "GET" and body is None and url in (
            "https://api.example/items?limit=5&offset=0",
            "https://api.example/items?limit=5&offset=10",
        )
        return (200 if ok else 500), {}, b"<p>ok</p>", "text/html; charset=utf-8"

    eng = CrawlEngine(
        spark, cfg, str(tmp_path / "s2"), HttpFetcher(opener=opener),
        options=EngineOptions(expected_total_urls=1024, shuffle_partitions=4),
    )
    eng.bootstrap_from_config()
    stats = eng.run(max_rounds=1)
    assert stats[0]["tasks"] == 2
    assert eng.table("pages").filter(F.col("result_code") != 200).count() == 0


def test_cli_run_with_synthetic_corpus(spark, tmp_path, capsys):
    """``python -m raven_spark run config.yaml --corpus ...``: strict
    config parse, range expansion in vars, engine rounds, sink fan-out
    from the config's output list, one-line JSON summary."""
    from raven_spark.__main__ import main
    from raven_spark.sources.corpus import generate_pages

    corpus_dir = str(tmp_path / "corpus")
    generate_pages(spark, 120, seed=42).write.mode("overwrite").parquet(corpus_dir)

    extra_sink = str(tmp_path / "extra_sink")
    cfg_yaml = f"""
name: cli-e2e
request:
  url: "https://host{{{{h}}}}.example/p/{{{{k}}}}"
  vars:
    - h: "[0..2]"
      k: "[0..9]"
  max_retry: 1
max_rounds: 2
output:
  - table:
      format: parquet
      path: {extra_sink}
"""
    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(cfg_yaml)
    state = str(tmp_path / "state")

    rc = main(["run", str(cfg_path), "--state", state, "--corpus", corpus_dir])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    summary = json.loads(out[-1])
    assert summary["name"] == "cli-e2e"
    assert summary["tasks"] > 0 and summary["rounds"] >= 1
    assert summary["persist_errors"] == []
    # primary state written and sink fan-out happened (P1)
    assert os.path.exists(os.path.join(state, "pages"))
    assert os.path.exists(os.path.join(extra_sink, "pages"))

"""Task-expansion algebra vs the reference's own test vectors.

Vectors ported from: config.rs:149-230 (6-task cross product),
config.rs:287-338 (key-value expansion), parser.rs:112-140 (template
quirks), parser.rs:250-271 (range expansion), parser.rs:211-239
(product_list), config_yaml_parse_test.rs:162-201 (defaults).
"""

from __future__ import annotations

from datetime import datetime

import pytest

from raven_spark.config import ConfigError, RavenConfig, RavenRequest, parse_config
from raven_spark.expansion import (
    CrawlTask,
    TemplateBuilder,
    TemplateKeyError,
    create_crawler_tasks,
    parse_key_value_maps,
    product_list,
    task_url_with_query,
    try_expand_numeric_list,
)

RUN_TS = datetime(2026, 1, 2, 3, 4, 5)


# --- ranges (parser.rs:250-271) ---------------------------------------------


def test_range_basic():
    assert try_expand_numeric_list("[1..5]") == ["1", "2", "3", "4", "5"]


def test_range_passthrough():
    assert try_expand_numeric_list("a1234") == ["a1234"]
    assert try_expand_numeric_list("id-[1..2") == ["id-[1..2"]  # unmatched "["


def test_range_multi_cross_product():
    assert try_expand_numeric_list("id-[1..2]-[1..2]") == [
        "id-1-1",
        "id-1-2",
        "id-2-1",
        "id-2-2",
    ]


def test_range_embedded():
    assert try_expand_numeric_list("id-[1..2]") == ["id-1", "id-2"]


# --- template (parser.rs:8-140) ----------------------------------------------


def test_template_bind():
    tb = TemplateBuilder("https://x/{{id}}/page/{{n}}")
    assert tb.keys == ["id", "n"]
    assert tb.build_string({"id": "7", "n": "3"}) == "https://x/7/page/3"


def test_template_missing_key_aborts():
    tb = TemplateBuilder("https://x/{{id}}")
    with pytest.raises(TemplateKeyError):
        tb.build_string({})


def test_template_unmatched_brace_is_plain_text():
    tb = TemplateBuilder("https://x/{{id")
    assert tb.keys == []
    assert tb.build_string({}) == "https://x/{{id"


def test_template_pathological_braces():
    # "{{numer{}}}" parses as key "numer{" with a trailing "}" as text
    tb = TemplateBuilder("x{{numer{}}}y")
    assert tb.keys == ["numer{"]
    assert tb.build_string({"numer{": "Z"}) == "xZ}y"


# --- key-value expansion (config.rs:287-338) -----------------------------------


def test_key_value_expansion_cross_product():
    maps = [{"a": ["1", "2"], "b": ["x", "y"]}]
    out = parse_key_value_maps(maps)
    # canonical sorted-key order -> fully deterministic sequence (§2.1)
    assert out == [
        {"a": "1", "b": "x"},
        {"a": "1", "b": "y"},
        {"a": "2", "b": "x"},
        {"a": "2", "b": "y"},
    ]


def test_key_value_expansion_concatenates_maps():
    maps = [{"a": ["1"]}, {"a": ["2"], "b": ["3"]}]
    out = parse_key_value_maps(maps)
    assert out == [{"a": "1"}, {"a": "2", "b": "3"}]


def test_key_value_expansion_with_ranges():
    out = parse_key_value_maps([{"id": ["[1..3]"]}])
    assert out == [{"id": "1"}, {"id": "2"}, {"id": "3"}]


# --- product_list (parser.rs:211-239) --------------------------------------------


def test_product_list():
    out = product_list([{"v": "1"}, {"v": "2"}], [{"p": "a"}])
    assert out == [({"v": "1"}, {"p": "a"}), ({"v": "2"}, {"p": "a"})]


def test_product_list_empty_side():
    out = product_list([], [{"p": "a"}])
    assert out == [({}, {"p": "a"})]
    assert product_list([], []) == [({}, {})]


# --- 6-task cross product (config.rs:196-215) -------------------------------------


def _six_task_config() -> RavenConfig:
    return RavenConfig(
        name="six",
        request=RavenRequest(
            url="https://example.com/{{id}}/items",
            method="GET",
            vars=[{"id": ["1", "2"]}],
            params=[
                {"offset": ["0"], "limit": ["100"]},
                {"offset": ["100", "300"], "limit": ["200"]},
            ],
        ),
    )


def test_six_task_cross_product():
    tasks = create_crawler_tasks(_six_task_config(), RUN_TS)
    assert len(tasks) == 6
    urls = sorted(task_url_with_query(t) for t in tasks)
    assert urls == sorted(
        [
            "https://example.com/1/items?limit=100&offset=0",
            "https://example.com/1/items?limit=200&offset=100",
            "https://example.com/1/items?limit=200&offset=300",
            "https://example.com/2/items?limit=100&offset=0",
            "https://example.com/2/items?limit=200&offset=100",
            "https://example.com/2/items?limit=200&offset=300",
        ]
    )
    # GET -> params routed to query, not body (config.rs:123-126)
    assert all(t.body_params == {} for t in tasks)


def test_post_routes_params_to_body():
    cfg = _six_task_config()
    cfg = RavenConfig(
        name="six",
        request=RavenRequest(
            url=cfg.request.url, method="POST", vars=cfg.request.vars, params=cfg.request.params
        ),
    )
    tasks = create_crawler_tasks(cfg, RUN_TS)
    assert all(t.query_params == {} and t.body_params for t in tasks)


def test_strftime_binding():
    cfg = RavenConfig(
        name="dated",
        request=RavenRequest(url="https://x/%Y-%m-%d/{{id}}", vars=[{"id": ["9"]}]),
    )
    tasks = create_crawler_tasks(cfg, RUN_TS)
    assert tasks[0].url == "https://x/2026-01-02/9"


def test_missing_template_key_aborts_run():
    cfg = RavenConfig(name="bad", request=RavenRequest(url="https://x/{{nope}}"))
    with pytest.raises(TemplateKeyError):
        create_crawler_tasks(cfg, RUN_TS)


# --- config parse + defaults (config_yaml_parse_test.rs:162-201) ---------------------


def test_config_defaults():
    cfg = parse_config({"name": "minimal", "request": {"url": "https://a/b"}})
    assert cfg.request.timeout_s == 1  # raven_request.rs:32-34
    assert cfg.request.max_retry == 0  # raven_request.rs:25-26
    assert cfg.parallelism == 1  # config.rs:37-39
    assert cfg.request.method == "GET"


def test_config_strict_types():
    with pytest.raises(ConfigError):
        parse_config({"name": "x", "request": {"url": "u", "vars": [{"k": {"bad": 1}}]}})
    with pytest.raises(ConfigError):
        parse_config({"name": "x", "request": {"url": "u", "vars": "notalist"}})
    with pytest.raises(ConfigError):
        parse_config({"request": {"url": "u"}})  # missing name


def test_config_scalar_accepted_as_singleton():
    cfg = parse_config({"name": "x", "request": {"url": "u", "vars": [{"k": "solo"}]}})
    assert cfg.request.vars == [{"k": ["solo"]}]


# --- DataFrame variants ---------------------------------------------------------


def test_tasks_df_matches_pure_expansion(spark):
    from raven_spark.expansion import tasks_df

    cfg = _six_task_config()
    df = tasks_df(spark, cfg, RUN_TS)
    rows = df.collect()
    assert len(rows) == 6
    got = sorted(r["url"] for r in rows)
    want = sorted(task_url_with_query(t) for t in create_crawler_tasks(cfg, RUN_TS))
    assert got == want


def test_expand_ranges_df(spark):
    from pyspark.sql import functions as F

    from raven_spark.expansion import expand_ranges_df

    df = spark.createDataFrame(
        [("id-[1..2]-[1..2]",), ("plain",), ("x[3..4]y",)], ["s"]
    )
    out = sorted(r["s"] for r in expand_ranges_df(df, "s").collect())
    assert out == sorted(
        ["id-1-1", "id-1-2", "id-2-1", "id-2-2", "plain", "x3y", "x4y"]
    )


def test_notify_scalar_slack_is_config_error():
    """Regression (code-review r3): a scalar `slack:` value must raise
    ConfigError (the strict-parse contract), not a raw TypeError."""
    import pytest

    from raven_spark.config import ConfigError, parse_config

    yaml_doc = """
name: t
request:
  url: "https://h.example/p"
output:
  - local_file: {file_path: /tmp/x}
notify:
  - slack: "https://hooks.example/xyz"
"""
    with pytest.raises(ConfigError, match="expected a mapping"):
        parse_config(yaml_doc)

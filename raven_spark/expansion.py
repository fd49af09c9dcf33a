"""Task-expansion algebra (SURVEY.md §2 T2-T8) — "query compilation".

The reference expands a config into a task list eagerly on one thread
(config.rs:46-100). Config-sized inputs stay driver-side here too (pure
functions below, ported semantics + test vectors), but the SAME algebra is
also exposed as DataFrame operators (bottom of this module) for seed lists
that are themselves big data (millions of templated seeds): ranges become
``explode(sequence(...))``, vars x params becomes ``crossJoin``, template
binding becomes a chain of JVM-side ``replace`` calls. Catalyst sees a
plain logical plan — no driver loops over rows.

Semantics carried over exactly:
- T3 numeric ranges "[a..b]" expand; multiple ranges per string fold as a
  cross product; unmatched "[" passes through (parser.rs:166-209, 184)
- T4 per-key expansion: map<k, [v...]> -> one map per combination
  (config.rs:232-285); canonical key order = sorted (the reference folds
  HashMap iteration order, which its own tests refuse to pin — §2.1)
- T5 vars x params Cartesian product (config.rs:64-99, parser.rs:240-248)
- T6 "{{key}}" template splice; missing key -> error aborting the run
  BEFORE any crawl (parser.rs:8-64, config.rs:96, runner.rs:76-79);
  unmatched "{{" degrades to plain text; "{{numer{}}}" parses as key
  "numer{" (parser.rs:129-139)
- T2 strftime substitution of the run timestamp into url/sink/var values
  (config.rs:50,56,245) — run_ts is an explicit argument (determinism)
- T8 GET/POST param routing (config.rs:123-126)
"""

from __future__ import annotations

import itertools
import re
from dataclasses import dataclass, field
from datetime import datetime
from typing import Any

from raven_spark.config import PersistMethod, RavenConfig

# --- T3: numeric-range expansion --------------------------------------------

_RANGE_RE = re.compile(r"\[(\d+)\.\.(\d+)\]")


def try_expand_numeric_list(s: str) -> list[str]:
    """"id-[1..2]" -> ["id-1", "id-2"]; multiple ranges fold as a cross
    product (parser.rs:196-206); strings without a complete range pattern
    pass through unchanged (parser.rs:184)."""
    m = _RANGE_RE.search(s)
    if not m:
        return [s]
    lo, hi = int(m.group(1)), int(m.group(2))
    step = 1 if hi >= lo else -1
    out: list[str] = []
    for v in range(lo, hi + step, step):
        prefix = s[: m.start()] + str(v)
        out.extend(prefix + rest for rest in try_expand_numeric_list(s[m.end() :]))
    return out


# --- T6: template splice ------------------------------------------------------


class TemplateKeyError(KeyError):
    """Missing template key — aborts the whole run before any crawl
    (config.rs:96 -> runner.rs:76-79)."""


@dataclass(frozen=True)
class TemplateBuilder:
    """Tokenizer + binder for "{{key}}" templates (parser.rs:8-110).

    Quirks preserved: an unmatched "{{" is plain text; the key is
    everything between "{{" and the FIRST "}}" (so "{{numer{}}}" binds key
    "numer{" and leaves a trailing "}" as text — parser.rs:129-139).
    """

    template: str
    # tokens: (is_key, text)
    tokens: tuple[tuple[bool, str], ...] = field(init=False)

    def __post_init__(self) -> None:
        toks: list[tuple[bool, str]] = []
        s, i = self.template, 0
        while True:
            open_ = s.find("{{", i)
            if open_ == -1:
                if i < len(s):
                    toks.append((False, s[i:]))
                break
            close = s.find("}}", open_ + 2)
            if close == -1:  # unmatched "{{" -> plain text
                toks.append((False, s[i:]))
                break
            if open_ > i:
                toks.append((False, s[i:open_]))
            toks.append((True, s[open_ + 2 : close]))
            i = close + 2
        object.__setattr__(self, "tokens", tuple(toks))

    @property
    def keys(self) -> list[str]:
        return [t for is_key, t in self.tokens if is_key]

    def build_string(self, values: dict[str, str]) -> str:
        out: list[str] = []
        for is_key, t in self.tokens:
            if is_key:
                if t not in values:
                    raise TemplateKeyError(f"could not find value: {t}")
                out.append(values[t])
            else:
                out.append(t)
        return "".join(out)


# --- T2: strftime substitution ------------------------------------------------


def strftime_bind(s: str, run_ts: datetime) -> str:
    """chrono `now.format(s)` equivalent (config.rs:50,56,245): %-codes
    substituted, other text passes through."""
    return run_ts.strftime(s)


# --- T4: per-key value expansion ----------------------------------------------


def parse_key_value_maps(
    maps: list[dict[str, list[str]]], run_ts: datetime | None = None
) -> list[dict[str, str]]:
    """Vec<HashMap<K, Vec<V>>> -> Vec<HashMap<K, V>> (config.rs:232-285).

    Each input map expands to the cross product of its keys' value lists
    (keys in CANONICAL sorted order — the reference folds HashMap order,
    untestable; §2.1); the per-map results concatenate in list order.
    Values get strftime substitution (config.rs:245) and numeric-range
    expansion (applied to each value before the product, parser.rs usage
    at config.rs:245-257).
    """
    out: list[dict[str, str]] = []
    for m in maps:
        keys = sorted(m)
        value_lists: list[list[str]] = []
        for k in keys:
            vals: list[str] = []
            for raw in m[k]:
                bound = strftime_bind(raw, run_ts) if run_ts else raw
                vals.extend(try_expand_numeric_list(bound))
            value_lists.append(vals)
        if not keys:
            out.append({})
            continue
        for combo in itertools.product(*value_lists):
            out.append(dict(zip(keys, combo)))
    return out


# --- T5: vars x params product --------------------------------------------------


def product_list(
    vars_maps: list[dict[str, str]], params_maps: list[dict[str, str]]
) -> list[tuple[dict[str, str], dict[str, str]]]:
    """parser.rs:240-248 — empty side behaves as a single empty binding."""
    vs = vars_maps or [{}]
    ps = params_maps or [{}]
    return [(v, p) for v in vs for p in ps]


# --- T1-T8 combined: config -> task list ("query compilation") ------------------


@dataclass(frozen=True)
class CrawlTask:
    """One fully-bound fetch+persist unit (raven_crawl_task.rs:12-16 /
    request.rs:6-16), flattened for DataFrame friendliness."""

    url: str
    method: str
    headers: dict[str, str]
    query_params: dict[str, str]
    body_params: dict[str, str]
    timeout_s: int
    max_retry: int
    sleep_s: int | None
    encoding_in: str | None
    encoding_out: str
    sinks: tuple[PersistMethod, ...]


def create_crawler_tasks(config: RavenConfig, run_ts: datetime) -> list[CrawlTask]:
    """config.rs:46-146, driver-side (configs are small). Deterministic
    given (config, run_ts): canonical sorted-key expansion order."""
    req = config.request
    url_template = TemplateBuilder(strftime_bind(req.url, run_ts))
    bound_sinks = [
        PersistMethod(kind=s.kind, path=strftime_bind(s.path, run_ts), region=s.region, bucket=s.bucket)
        for s in config.sinks
    ]
    vars_maps = parse_key_value_maps(req.vars, run_ts)
    params_maps = parse_key_value_maps(req.params, run_ts)
    tasks: list[CrawlTask] = []
    for var_map, param_map in product_list(vars_maps, params_maps):
        url = url_template.build_string(var_map)  # missing key raises -> run aborts (runner.rs:76-79)
        sinks = tuple(
            PersistMethod(
                kind=s.kind, path=TemplateBuilder(s.path).build_string(var_map), region=s.region, bucket=s.bucket
            )
            for s in bound_sinks
        )
        if req.method == "GET":  # T8 routing (config.rs:123-126)
            qp, bp = dict(param_map), {}
        else:
            qp, bp = {}, dict(param_map)
        tasks.append(
            CrawlTask(
                url=url,
                method=req.method,
                headers=dict(req.headers),
                query_params=qp,
                body_params=bp,
                timeout_s=req.timeout_s,
                max_retry=req.max_retry,
                sleep_s=config.sleep_s,
                encoding_in=req.encoding_in,
                encoding_out=req.encoding_out,
                sinks=sinks,
            )
        )
    return tasks


def task_url_with_query(task: CrawlTask) -> str:
    """F1 query-string construction — the reference emits HashMap-ordered,
    un-encoded query strings (crawler.rs:34-37,178-192, nondeterministic);
    we emit sorted keys (canonicalize-ready; §2.1 determinism note)."""
    if not task.query_params:
        return task.url
    qs = "&".join(f"{k}={v}" for k, v in sorted(task.query_params.items()))
    sep = "&" if "?" in task.url else "?"
    return f"{task.url}{sep}{qs}"


# =============================================================================
# DataFrame variants — same algebra for big seed lists
# =============================================================================


def expand_ranges_df(df, col: str):
    """T3 at scale: explode every "[a..b]" occurrence in ``col`` using only
    JVM built-ins. Iterates plan-construction (not data) until a fixpoint:
    each pass rewrites one range per string via regexp_extract +
    explode(sequence(a, b)). K passes for K ranges; K is bounded by the
    max ranges per template (checked driver-side, configs are tiny).
    """
    from pyspark.sql import functions as F

    first = r"^(.*?)\[(\d+)\.\.(\d+)\](.*)$"  # anchored -> first occurrence only
    max_ranges = 4  # templates with more ranges than this are config errors
    for _ in range(max_ranges):
        has = F.regexp_like(F.col(col), F.lit(first))
        lo = F.regexp_extract(F.col(col), first, 2).cast("long")
        hi = F.regexp_extract(F.col(col), first, 3).cast("long")
        expanded = F.explode(
            F.when(has, F.sequence(lo, hi)).otherwise(F.array(F.lit(None).cast("long")))
        )
        df = df.withColumn("__n", expanded).withColumn(
            col,
            F.when(
                F.col("__n").isNotNull(),
                F.concat(
                    F.regexp_extract(F.col(col), first, 1),
                    F.col("__n").cast("string"),
                    F.regexp_extract(F.col(col), first, 4),
                ),
            ).otherwise(F.col(col)),
        ).drop("__n")
    return df


def bind_template_df(df, template_col: str, keys: list[str], out_col: str):
    """T6 at scale: bind "{{key}}" placeholders from same-named columns via
    a chain of JVM-side replace calls (codegen'd; no Python). Missing-key
    detection stays a driver-side config check (runner.rs:76-79 aborts
    pre-crawl, so it is not a data-plane concern)."""
    from pyspark.sql import functions as F

    expr = F.col(template_col)
    for k in keys:
        expr = F.replace(expr, F.lit("{{%s}}" % k), F.col(k).cast("string"))
    return df.withColumn(out_col, expr)


def expand_key_values_df(spark, maps: list[dict[str, list[str]]], prefix: str = ""):
    """T4 at scale: one DataFrame per input map (each key exploded from its
    array literal -> cross product), then unionByName across maps.
    Returns None when ``maps`` is empty (product treats it as one empty
    binding, parser.rs:240-248)."""
    from functools import reduce

    from pyspark.sql import functions as F

    if not maps:
        return None
    all_keys = sorted({k for m in maps for k in m})
    dfs = []
    for m in maps:
        df = spark.range(1).select(F.lit(1).alias("__one"))
        for k in sorted(m):
            vals: list[str] = []
            for raw in m[k]:
                vals.extend(try_expand_numeric_list(raw))
            df = df.withColumn(prefix + k, F.explode(F.array(*[F.lit(v) for v in vals])))
        for k in all_keys:  # align schemas across maps
            if k not in m:
                df = df.withColumn(prefix + k, F.lit(None).cast("string"))
        dfs.append(df.drop("__one"))
    return reduce(lambda a, b: a.unionByName(b), dfs)


def tasks_df(spark, config: RavenConfig, run_ts: datetime):
    """T5+T6 at scale: vars_df crossJoin params_df, template-bound url.
    The cross join is intentional — it IS the reference's only join
    (config.rs:90); both sides are config-derived and tiny relative to the
    frontier, so Catalyst broadcasts them for free."""
    from pyspark.sql import functions as F

    req = config.request
    url_template = strftime_bind(req.url, run_ts)
    tmpl_keys = TemplateBuilder(url_template).keys

    vars_df = expand_key_values_df(spark, req.vars)
    params_df = expand_key_values_df(spark, req.params, prefix="p_")
    base = vars_df if vars_df is not None else spark.range(1).select(F.lit(1).alias("__v"))
    if params_df is not None:
        base = base.crossJoin(params_df)
    missing = [k for k in tmpl_keys if k not in base.columns]
    if missing:
        raise TemplateKeyError(f"could not find value: {missing[0]}")
    base = base.withColumn("__tmpl", F.lit(url_template))
    base = bind_template_df(base, "__tmpl", tmpl_keys, "url")
    param_cols = [c for c in base.columns if c.startswith("p_")]
    if param_cols:
        kvs: list = []
        for c in param_cols:
            kvs.extend([F.lit(c[2:]), F.col(c)])
        params_map = F.map_filter(F.create_map(*kvs), lambda _, v: v.isNotNull())
    else:
        params_map = F.expr("map()").cast("map<string,string>")
    # T8 routing (config.rs:123-126)
    empty = F.expr("map()").cast("map<string,string>")
    is_get = F.lit(req.method == "GET")
    out = base.select(
        F.col("url"),
        F.lit(req.method).alias("method"),
        F.when(is_get, params_map).otherwise(empty).alias("query_params"),
        F.when(~is_get, params_map).otherwise(empty).alias("body_params"),
        F.lit(req.timeout_s).alias("timeout_s"),
        F.lit(req.max_retry).alias("max_retry"),
        F.lit(config.sleep_s).cast("int").alias("sleep_s"),
    )
    # canonical query-string append for GET (sorted keys, §2.1)
    sorted_entries = F.array_sort(F.map_entries(F.col("query_params")))
    qs = F.array_join(
        F.transform(sorted_entries, lambda e: F.concat(e["key"], F.lit("="), e["value"])),
        "&",
    )
    out = out.withColumn(
        "url",
        F.when(
            F.size(F.map_entries(F.col("query_params"))) > 0,
            F.concat(F.col("url"), F.when(F.col("url").contains("?"), F.lit("&")).otherwise(F.lit("?")), qs),
        ).otherwise(F.col("url")),
    )
    return out

"""Politeness + priority scheduling: per-host token buckets as window
functions, robots.txt gating as a broadcast join.

The reference throttles by SLEEPING serially before every attempt
(crawler.rs:42-45) — on Spark a sleep inside an executor stalls a whole
core, so the scale-out equivalent (BASELINE.json north_rule) is a per-host
per-round budget:

    row_number() OVER (PARTITION BY host ORDER BY priority, url_hash)
        <= budget  -> scheduled this round
        >  budget  -> deferred back to the frontier with boosted priority

The window's partition key is the host — skew-prone (Zipf hosts), but the
window only ranks WITHIN a host and every host's rows cap at `budget`
output rows; AQE skew handling plus the salt_bucket repartitioning keep
the sort partitions bounded.

Robots gating: a small `robots` table (host, deny_prefixes, allow_
prefixes, crawl_delay_s) broadcast-joined to candidates; deny beats allow;
longest-prefix wins within each list (standard robots.txt precedence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def host_order():
    """Deterministic total order inside a host: priority asc (0 = most
    urgent), then depth asc, then url_hash — the engine's canonical crawl
    order (§2.1). A function (not a module constant) because Column
    construction needs an active session."""
    return [F.col("priority").asc(), F.col("depth").asc(), F.col("url_hash").asc()]


def schedule_budget(
    candidates: DataFrame,
    host_budget: int,
    defer_priority_boost: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """Split candidates into (scheduled, deferred) by per-host budget.

    Deferred rows return to the frontier with priority boosted (lower
    number = sooner) so a host-starved URL cannot starve forever —
    the reference's FIFO fairness (runner.rs:98-101) re-expressed.
    """
    w = Window.partitionBy("host").orderBy(*host_order())
    ranked = candidates.withColumn("host_rank", F.row_number().over(w))
    scheduled = ranked.filter(F.col("host_rank") <= host_budget).drop("host_rank")
    deferred = (
        ranked.filter(F.col("host_rank") > host_budget)
        .drop("host_rank")
        .withColumn("priority", F.greatest(F.col("priority") - F.lit(defer_priority_boost), F.lit(0)))
        .withColumn("deferred_count", F.col("deferred_count") + 1)
    )
    return scheduled, deferred


ROBOTS_SCHEMA = (
    "host string, allow array<string>, deny array<string>, crawl_delay_s int,"
    " sitemaps array<string>"
)


def parse_robots_txt(text: str | None, agent: str = "*") -> tuple[list[str], list[str], int | None]:
    """One robots.txt body -> (allow_prefixes, deny_prefixes, crawl_delay_s)
    for the given user-agent, standard google-style grouping semantics:

    - groups start at one-or-more User-agent lines; rules attach to the
      preceding agent block
    - the most specific matching agent group wins (longest agent token
      match; '*' is the least specific); we match case-insensitively
    - Allow/Disallow values are path prefixes; empty Disallow means
      allow-all (ignored); Crawl-delay parsed as int seconds
    """
    if not text:
        return [], [], None
    best: tuple[int, list[str], list[str], int | None] | None = None
    cur_agents: list[str] = []
    cur_allow: list[str] = []
    cur_deny: list[str] = []
    cur_delay: int | None = None
    in_rules = False

    def _commit():
        nonlocal best
        if not cur_agents:
            return
        score = -1
        for a in cur_agents:
            if a == "*":
                score = max(score, 0)
            elif a in agent.lower() or agent.lower() in a:
                score = max(score, len(a))
        if score >= 0 and (best is None or score > best[0]):
            best = (score, list(cur_allow), list(cur_deny), cur_delay)

    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if in_rules:  # new group begins
                _commit()
                cur_agents, cur_allow, cur_deny, cur_delay = [], [], [], None
                in_rules = False
            cur_agents.append(value.lower())
        elif field in ("allow", "disallow", "crawl-delay"):
            in_rules = True
            if field == "allow" and value:
                cur_allow.append(value)
            elif field == "disallow" and value:
                cur_deny.append(value)
            elif field == "crawl-delay":
                try:
                    cur_delay = int(float(value))
                except ValueError:
                    pass
    _commit()
    if best is None:
        return [], [], None
    return best[1], best[2], best[3]


def robots_rules_df(robots_texts: DataFrame, agent: str = "*") -> DataFrame:
    """(host, robots_txt) rows -> ROBOTS_SCHEMA rules table.

    Arrow-batched mapInPandas (robots bodies are small; one pass). The
    output is the broadcast side of robots_flag — at any scale the rules
    table is O(hosts), not O(urls)."""
    import pandas as pd

    from raven_spark.operators.sitemaps import robots_sitemap_urls

    def parse(batches):
        for pdf in batches:
            rows = [parse_robots_txt(t, agent) for t in pdf["robots_txt"]]
            yield pd.DataFrame({
                "host": pdf["host"],
                "allow": [r[0] for r in rows],
                "deny": [r[1] for r in rows],
                "crawl_delay_s": pd.array([r[2] for r in rows], dtype="Int32"),
                "sitemaps": [robots_sitemap_urls(t) for t in pdf["robots_txt"]],
            })

    return robots_texts.select("host", "robots_txt").mapInPandas(parse, ROBOTS_SCHEMA)


def fetch_robots(
    hosts: DataFrame,
    opener=None,
    agent: str = "*",
    timeout_s: int = 2,
    scheme: str = "https",
    concurrency: int = 16,
    max_bytes: int = 512 * 1024,
) -> DataFrame:
    """(host) rows -> ROBOTS_SCHEMA rules table by fetching
    ``{scheme}://{host}/robots.txt`` through the injected opener (the same
    seam as the HTTP fetch stage) and parsing with parse_robots_txt.

    One request per DISTINCT host — the robots table is O(hosts), never
    O(urls), so this runs once per crawl (or per TTL) and broadcasts.
    Within each mapInPandas partition the requests run on a small thread
    pool: robots endpoints are DISTINCT hosts (politeness is per-host, so
    concurrent requests never hit the same server), and the work is pure
    network wait — at millions of hosts a serial loop would make this
    stage latency-bound at ~1/(RTT) hosts/sec/worker instead of
    ~concurrency/(RTT). Missing/unfetchable robots.txt (404s, transport
    errors, timeouts) yield an all-allow row, matching crawler convention.

    The opener must be thread-safe under ``concurrency > 1`` (the default
    urllib opener is stateless and is; a connection-pooling opener is not
    — pass concurrency=1 to serialize, pooling buys nothing across
    distinct hosts anyway).
    """

    import pandas as pd

    if opener is None:
        from raven_spark.operators.http import default_opener

        opener = default_opener

    from raven_spark.operators.sitemaps import robots_sitemap_urls

    # robots bodies are bounded at the read (RFC 9309 §2.4: parsers may
    # enforce ~500 KiB; rules past the cap are ignored) so a hostile host
    # can't balloon the worker. Injected openers without the kwarg fall
    # back to a post-read slice.
    from raven_spark.operators.http import supports_max_bytes

    bounded = supports_max_bytes(opener)

    def fetch_one(host):
        text = None
        try:
            kw = {"max_bytes": max_bytes} if bounded else {}
            status, _hdrs, raw, _ct = opener(
                f"{scheme}://{host}/robots.txt", method="GET",
                headers={}, body=None, timeout_s=timeout_s, **kw,
            )
            if status == 200 and raw:
                truncated = len(raw) >= max_bytes
                text = raw[:max_bytes].decode("utf-8", errors="replace")
                if truncated:
                    # RFC 9309 §2.4: content past the cap is IGNORED — a
                    # line cut mid-rule must not parse as a different,
                    # shorter rule ('Disallow: /private-archive' cut to
                    # 'Disallow: /p' would deny half the site). A single
                    # line exceeding the whole cap leaves nothing
                    # parseable -> allow-all, the unfetchable convention.
                    text = text.rsplit("\n", 1)[0] if "\n" in text else ""
        except (TimeoutError, OSError):
            pass  # unreachable -> allow-all
        allow, deny, delay = parse_robots_txt(text, agent)
        return (host, allow, deny, delay, robots_sitemap_urls(text))

    def run(batches):
        from concurrent.futures import ThreadPoolExecutor

        for pdf in batches:
            host_list = list(pdf["host"])
            if not host_list:
                continue
            if len(host_list) == 1:
                out_rows = [fetch_one(host_list[0])]
            else:
                with ThreadPoolExecutor(min(concurrency, len(host_list))) as pool:
                    out_rows = list(pool.map(fetch_one, host_list))
            yield pd.DataFrame({
                "host": [r[0] for r in out_rows],
                "allow": [r[1] for r in out_rows],
                "deny": [r[2] for r in out_rows],
                "crawl_delay_s": pd.array([r[3] for r in out_rows], dtype="Int32"),
                "sitemaps": [r[4] for r in out_rows],
            })

    return hosts.select("host").distinct().mapInPandas(run, ROBOTS_SCHEMA)


def _rule_match_len(path: Column, p: Column) -> Column:
    """Match length of one robots rule pattern against a path: the raw
    pattern length when it matches, -1 when it doesn't (RFC 9309 §2.2.2
    "most specific match" = longest pattern in octets).

    Two evaluation paths, chosen per pattern:
    - plain prefix (no '*', no trailing '$'): startswith — the common
      case, no regex compile.
    - RFC 9309 wildcards: '*' matches any span, a trailing '$' anchors
      the match at path end ('$' anywhere else is a literal). Compiled
      per-row into an anchored-prefix regex: split on '*', regex-escape
      each literal segment, rejoin with '.*' (greedy regex backtracking
      IS glob semantics), prefix '^', suffix '$' when anchored. The
      limit=-1 split keeps trailing empty segments so 'a*$' becomes
      '^a.*$', not '^a$'.
    """
    anchor = F.endswith(p, F.lit("$"))
    body = F.when(anchor, F.substring(p, 1, F.length(p) - 1)).otherwise(p)
    is_glob = body.contains("*") | anchor
    segs = F.split(body, r"\*", -1)
    esc = F.transform(
        segs, lambda s: F.regexp_replace(s, r"([^a-zA-Z0-9])", r"\\$1")
    )
    rx = F.concat(
        F.lit("^"),
        F.array_join(esc, ".*"),
        F.when(anchor, F.lit("$")).otherwise(F.lit("")),
    )
    return F.when(
        is_glob,
        F.when(F.regexp_like(path, rx), F.length(p)).otherwise(F.lit(-1)),
    ).otherwise(
        F.when(path.startswith(p), F.length(p)).otherwise(F.lit(-1))
    )


def robots_flag(candidates: DataFrame, robots: DataFrame | None, flag_col: str = "robots_ok") -> DataFrame:
    """Adds boolean ``robots_ok`` after robots rules — a FLAG, not a split,
    so the round plan can materialize one DataFrame and branch with cheap
    cache-local filters (no upstream recompute per branch).

    The rules table is tiny relative to the frontier -> broadcast hash
    join, zero shuffle on the candidate side. Path precedence: RFC 9309
    §2.2.2 — the longest matching pattern among allow+deny wins (raw
    pattern length, wildcards counted); tie -> allow (RFC: "least
    restrictive", = Google semantics); no rule rows for a host ->
    allowed. Patterns support the RFC's '*' wildcard and trailing-'$'
    end anchor (_rule_match_len); plain prefixes — the overwhelming
    majority in the wild — keep the regex-free startswith path.
    """
    if robots is None:
        return candidates.withColumn(flag_col, F.lit(True))
    # full path after authority
    path = F.regexp_extract(F.col("url_canon"), r"^[a-z]+://[^/]+(/.*)$", 1)
    joined = candidates.join(F.broadcast(robots), on="host", how="left")
    longest = lambda arr: F.coalesce(  # noqa: E731
        F.array_max(F.transform(arr, lambda p: _rule_match_len(path, p))),
        F.lit(-1),
    )
    deny_len = longest(F.col("deny"))
    allow_len = longest(F.col("allow"))
    is_allowed = F.col("deny").isNull() | (deny_len <= allow_len) | (deny_len == -1)
    return joined.withColumn(flag_col, is_allowed).drop("allow", "deny", "crawl_delay_s")


def robots_gate(candidates: DataFrame, robots: DataFrame | None) -> tuple[DataFrame, DataFrame]:
    """(allowed, denied) after robots rules — split view over robots_flag."""
    flagged = robots_flag(candidates, robots)
    return (
        flagged.filter(F.col("robots_ok")).drop("robots_ok"),
        flagged.filter(~F.col("robots_ok")).drop("robots_ok"),
    )


def effective_budget_col(robots: DataFrame | None, default_budget: int):
    """Per-host budget honoring robots crawl_delay: budget' = min(budget,
    round_seconds / crawl_delay_s). Returned as (host, host_budget) rows to
    broadcast-join before schedule_budget when robots data exists."""
    if robots is None:
        return None
    round_seconds = 60  # nominal round wall-clock for budget math
    # the crawl-delay cap applies ONLY when the host actually declares one:
    # greatest() skips NULLs, so without the isNotNull gate a host that
    # merely HAS a robots.txt (crawl_delay_s NULL) would silently be capped
    # at min(default, round_seconds/1)
    capped = F.least(
        F.lit(default_budget),
        F.greatest(
            (F.lit(round_seconds) / F.greatest(F.col("crawl_delay_s"), F.lit(1))).cast("int"),
            F.lit(1),
        ),
    )
    return robots.select(
        "host",
        F.when(F.col("crawl_delay_s").isNotNull(), capped)
        .otherwise(F.lit(default_budget))
        .alias("host_budget"),
    )


def adaptive_host_budget(
    latencies: DataFrame,
    host_col: str = "host",
    round_col: str = "round_no",
    latency_col: str = "latency_ms",
    target_ms: float = 200.0,
    alpha: float = 0.3,
    base_budget: int = 10,
    max_budget: int = 50,
    ewma_dp: int = 9,
) -> DataFrame:
    """Latency-adaptive per-host politeness budgets — the feedback loop a
    static crawl-delay misses: a host that answers in 40 ms can absorb
    more requests per round than one struggling at 900 ms, and an
    overloaded host's rising latency should shed our load BEFORE it
    starts 503ing (reference scope ends at fixed sleep/crawl-delay,
    config.rs:32; this is the scale layer on top).

    Signal: per-(host, round) mean fetch latency, smoothed with an
    exponentially weighted moving average over rounds:

        e_1 = x_1;  e_k = round(alpha*x_k + (1-alpha)*e_{k-1}, ewma_dp)

    computed DISTRIBUTED via the closed form (one row_number window over
    (host, round) per-round means + one aggregate — no driver state, no
    iterative job):

        e_n = round(sum_i w_i*x_i, ewma_dp) with
        w_i = alpha*(1-alpha)^(n-i) for i>1, w_1 = (1-alpha)^(n-1)

    (closed-form weights skip the per-step rounding of the recurrence;
    ewma_dp=9 makes the float sum order-independent in practice, the
    graph.py/pagerank rounding discipline, so the DuckDB twin q105
    replays byte-identically).

    Budget: proportional control clamped to [1, max_budget] —
        budget = clamp(round(base_budget * target_ms / ewma), 1, max)
    A fast host (ewma << target) earns up to max_budget slots per round;
    a slow one degrades toward 1. Composes with robots crawl-delay caps:
    callers take least(adaptive, effective_budget_col) downstream.

    Scale shape: per-round means are a map-side-combinable aggregate on
    (host, round); the window + final fold shuffle O(hosts x rounds)
    8-byte-keyed rows once, output O(hosts). No collect, no state.

    Output: (host, n_rounds, ewma_ms, budget).
    """
    if not (0.0 < alpha <= 1.0):
        raise ValueError("adaptive_host_budget: alpha must be in (0, 1]")
    per_round = latencies.groupBy(host_col, round_col).agg(
        F.avg(F.col(latency_col)).alias("__x")
    )
    w = Window.partitionBy(host_col).orderBy(F.col(round_col).asc())
    idx = per_round.select(
        F.col(host_col).alias("host"),
        F.col("__x"),
        F.row_number().over(w).alias("__i"),
        F.count(F.lit(1)).over(Window.partitionBy(host_col)).alias("__n"),
    )
    weight = F.when(
        F.col("__i") == 1, F.pow(F.lit(1.0 - alpha), F.col("__n") - 1)
    ).otherwise(
        F.lit(alpha) * F.pow(F.lit(1.0 - alpha), F.col("__n") - F.col("__i"))
    )
    folded = idx.groupBy("host").agg(
        F.max("__n").alias("n_rounds"),
        F.round(F.sum(F.col("__x") * weight), ewma_dp).alias("__ewma"),
    )
    # ewma <= 0 (all-zero measured latencies — mocked fetches, ms
    # truncation) means "infinitely fast": award max_budget instead of
    # tripping ANSI divide-by-zero and killing the round
    budget = F.when(F.col("__ewma") <= 0, F.lit(int(max_budget))).otherwise(
        F.greatest(
            F.lit(1),
            F.least(
                F.lit(int(max_budget)),
                F.round(
                    F.lit(float(base_budget)) * F.lit(float(target_ms)) / F.col("__ewma")
                ).cast("int"),
            ),
        )
    )
    return folded.select(
        "host",
        "n_rounds",
        F.round("__ewma", 6).alias("ewma_ms"),
        budget.alias("budget"),
    )

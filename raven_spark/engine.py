"""CrawlEngine — the driver loop of rounds with checkpoint/resume.

Replaces the reference's run_raven_application (runner.rs:25-81): where the
reference eagerly materializes Vec<RavenCrawlTask> and waits on a thread
pool, the engine materializes each round's deltas through the Catalog and
lets Spark schedule the work. State layout (ParquetCatalog fallback for
Iceberg, sources/catalog.py):

    {root}/frontier/round=N     candidates added at round N (seeds at 0,
                                discoveries + deferrals at N>0)
    {root}/url_seen/round=N     hashes scheduled/denied at round N
                                (+ _bloom.bin sidecar: the round's Bloom
                                delta, OR-merged for pruning — blooms are
                                fixed-capacity so union is bitwise OR)
    {root}/pages/round=N        fetch results (bodies, errors-as-data)
    {root}/text/round=N         url_canon -> extracted text (the
                                input_hint write-back table)
    {root}/metrics/round=N      crawler metrics (M2), partitioned lineage
    {root}/rounds.json          run manifest: per-round counts, timings,
                                persist errors — resume token

Resume: `CrawlEngine.resume()` re-reads rounds.json and continues from the
first uncommitted round; all writes are idempotent per round (overwrite of
the round's own partition), so a crash mid-round re-runs exactly that
round and converges to the same state (determinism tests assert this).

Persist fan-out parity (P1, raven_crawl_task.rs:44-84): each round's pages
delta is written to EVERY sink; a round fails only if ALL sinks fail;
partial failures are recorded in the manifest as persist_errors.
"""

from __future__ import annotations

import json
import os
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from raven_spark.config import RavenConfig
from raven_spark.operators.fetch import Fetcher
from raven_spark.operators.seen import (
    BloomFilter,
    ShardedBloom,
    ShardedCuckoo,
    build_bloom,
    build_bloom_shards,
    build_cuckoo_shards,
)
from raven_spark.plans.round import frontier_from_urls, discovered_frontier, plan_round
from raven_spark.sources.catalog import ParquetCatalog


@dataclass
class EngineOptions:
    expected_total_urls: int = 1 << 20  # sizes the Bloom (fixed across rounds)
    bloom_fpp: float = 0.01
    # 0 -> monolithic bitmap (broadcast prune; fine to ~10^8 urls).
    # >0 -> THE 10^10 posture: per-shard filters keyed by pmod(url_hash,
    # n), stored as a catalog TABLE (never driver-held), probed via
    # cogroup so each task holds 1/n of the bitmap and nothing broadcasts.
    bloom_shards: int = 0
    # probabilistic seen-filter family when bloom_shards > 0: "bloom"
    # (OR-mergeable bitmap, smallest bytes/key) or "cuckoo" (deletable —
    # recrawl/TTL invalidation via delete_from_cuckoo_shards without a
    # full rebuild; north_star's "Bloom/cuckoo" alternative)
    seen_filter: str = "bloom"
    # recrawl TTL: a capture blocks re-fetch for this many FOLLOWING
    # rounds; older url_seen rounds (and their filter deltas/sidecars)
    # simply fall out of the windowed catalog read, so expiry costs
    # nothing — no delete pass, no rebuild (for selective invalidation
    # inside the window, see seen.delete_from_cuckoo_shards). None =
    # fetch-once-forever (reference semantics).
    seen_ttl_rounds: int | None = None
    # with seen_ttl_rounds: join If-None-Match/If-Modified-Since validators
    # from the latest prior capture onto every round's frontier, so TTL
    # refetches revalidate (304) instead of re-downloading bodies. Only
    # meaningful with an HTTP fetcher (SyntheticFetcher ignores them).
    revalidate: bool = False
    shuffle_partitions: int | None = None
    max_depth: int | None = None
    extra_sinks: list = field(default_factory=list)  # additional Catalogs (P1 fan-out)
    notify: object = None  # callable(message: str, summary: dict) — S1 seam
    # callable(method: NotifyMethod, level, label, message) — the delivery
    # seam for config-declared notify methods (the Slack POST in
    # notify_method.rs:17-66; injected here because outbound webhooks are
    # deployment config, not engine code). A method fires only when its
    # configured level EQUALS the event level (instances.rs:93-100):
    # level=error -> failures only, level=info -> completions only.
    notify_poster: object = None
    # every N rounds, merge the small-delta tables' per-round directories
    # into one segment (catalog.compact): a 10^4-round crawl otherwise
    # lists 10^4 directories on every windowed url_seen/filter-shard/
    # robots/frontier read. Rewrite cost is O(those tables) — hashes and
    # rules, never page bodies (pages is append-only and excluded). None
    # = off.
    compact_every: int | None = None
    # callable(hosts_df: DataFrame[host]) -> ROBOTS_SCHEMA DataFrame.
    # When set, the engine fetches rules for every host the crawl reaches
    # BEFORE scheduling it: round 0 covers the seed hosts, and each later
    # round covers hosts newly discovered via links (which a static
    # pre-fetched table would default-allow without ever consulting
    # their robots.txt).
    robots_fetcher: object = None


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        config: RavenConfig,
        state_root: str,
        fetcher: Fetcher,
        robots: DataFrame | None = None,
        options: EngineOptions | None = None,
    ):
        self.spark = spark
        self.config = config
        self.state_root = state_root
        self.fetcher = fetcher
        self.opt = options or EngineOptions()
        self.catalog = ParquetCatalog(spark, state_root)
        if "://" not in state_root and not state_root.startswith("file:/"):
            os.makedirs(state_root, exist_ok=True)
        # Robots rules live in a catalog TABLE next to url_seen — never as
        # a driver-resident row list (at 10^10 URLs the frontier touches
        # 10^7-10^8 hosts; a collected list re-serialized through
        # createDataFrame every refresh is the same scale-killer class as
        # a monolithic driver Bloom). fetch_robots returns a lazy
        # mapInPandas pipeline — joined as-is, every consuming plan would
        # re-fetch each host's robots.txt over the network (and could see
        # DIFFERENT content mid-crawl); the one catalog append below IS
        # the materialize-once action. Robots-table round numbering:
        # prefetched rules land at round 0, the per-crawl-round refresh
        # for newly discovered hosts appends at crawl_round + 1 (so
        # re-running a crashed round overwrites exactly its own delta).
        # On RESUME the table already exists and is authoritative: round 0
        # may have been folded into a compacted segment, where a blind
        # re-append would DUPLICATE every prefetched rule (append's
        # idempotence is per round DIR; a segment is not re-overwritten).
        if robots is not None and not self.catalog.exists("robots"):
            self.catalog.append("robots", robots, 0)

    _ROBOTS_RULE_COLS = ["host", "allow", "deny", "crawl_delay_s"]

    def _robots_for_round(self, round_no: int) -> DataFrame | None:
        """Rules visible to crawl round N: robots-table deltas 0..N+1
        (prefetch + every refresh up to and including this round's). The
        rule columns only — the sitemaps pointer column never rides the
        flag/budget joins."""
        df = self.catalog.read("robots", upto_round=round_no + 1)
        if df is None:
            return None
        return df.select(*self._ROBOTS_RULE_COLS)

    def _refresh_robots(self, frontier_delta: DataFrame, round_no: int) -> None:
        """Fetch rules for hosts in this round's delta that have none yet
        and append them as the robots-table delta for this round — fully
        distributed: new hosts come from a left-anti join against the
        rules table (O(new hosts) fetch work; known hosts are never
        re-requested), and the append materializes the lazy fetch exactly
        once. No robots row ever transits the driver."""
        if self.opt.robots_fetcher is None:
            return
        hosts = frontier_delta.select("host").distinct()
        known = self.catalog.read("robots", upto_round=round_no)
        if known is not None:
            hosts = hosts.join(known.select("host"), on="host", how="left_anti")
        # steady state (no newly discovered hosts) must not run the fetch
        # pipeline or append an empty delta dir: without this guard a
        # 10^4-round crawl accumulates 10^4 empty robots round dirs that
        # every later read/refresh re-lists — the O(rounds) listing cost
        # compaction exists to avoid. isEmpty() is a LIMIT-1 job over the
        # anti-join: O(new hosts) work, trivially cheap in steady state.
        if hosts.isEmpty():
            return
        self.catalog.append("robots", self.opt.robots_fetcher(hosts), round_no + 1)

    # -- manifest -------------------------------------------------------------
    # run manifest + Bloom sidecars go through the catalog blob API so URI
    # state roots (file:/, s3a://) behave exactly like local paths

    def _load_rounds(self) -> dict:
        raw = self.catalog.read_blob("rounds.json")
        if raw is None:
            return {"completed": [], "stats": {}}
        return json.loads(raw.decode("utf-8"))

    def _commit_round(self, round_no: int, stats: dict) -> None:
        m = self._load_rounds()
        if round_no not in m["completed"]:
            m["completed"].append(round_no)
            m["completed"].sort()
        m["stats"][str(round_no)] = stats
        self.catalog.write_blob(
            "rounds.json", json.dumps(m, indent=1, sort_keys=True).encode("utf-8")
        )

    def last_completed_round(self) -> int | None:
        c = self._load_rounds()["completed"]
        return max(c) if c else None

    # -- bloom sidecars ---------------------------------------------------------
    # stored via the catalog's blob API so URI state roots (file:/, s3a://)
    # work the same as local paths

    def _bloom_relpath(self, round_no: int) -> str:
        return f"url_seen/round={round_no}/_bloom.bin"

    # the per-round sidecars live INSIDE the round=N delta dirs, which
    # compaction deletes; their union is folded into this standing blob
    # first (see the compaction block in _run_round), otherwise the
    # merged Bloom silently loses the compacted rounds and its
    # no-false-negative contract breaks -> duplicate fetches (caught by
    # test_long_horizon_compaction_100_rounds: p/220 refetched at r9)
    _SEG_BLOOM_RELPATH = "url_seen/_segment_bloom.bin"

    def _merged_bloom(self, upto_round: int, from_round: int = 0) -> BloomFilter | None:
        """OR of committed per-round Bloom deltas in [from_round, upto] —
        O(rounds) bitmap ORs on the driver, no table scan (the north_star
        merge choreography: per-partition build happens at write time via
        treeAggregate). ``from_round`` implements the recrawl TTL: expired
        rounds' sidecars are simply skipped.

        The segment blob (compacted history's union) is always included
        when present: for TTL windows it over-approximates — a SUPERSET
        prune only adds exact-anti-join work, never drops a live row —
        and subtract_seen's exact join against the row-windowed seen
        table keeps TTL refetch semantics exact."""
        merged: BloomFilter | None = None
        raw = self.catalog.read_blob(self._SEG_BLOOM_RELPATH)
        if raw is not None:
            merged = BloomFilter.from_bytes(raw)
        for r in range(from_round, upto_round + 1):
            raw = self.catalog.read_blob(self._bloom_relpath(r))
            if raw is None:
                continue
            b = BloomFilter.from_bytes(raw)
            merged = b if merged is None else merged.union(b)
        return merged

    # -- lifecycle ---------------------------------------------------------------

    def bootstrap(self, seed_urls: list[str]) -> None:
        """Write frontier Δ(0) from the seed list (round -1 'compilation')."""
        f0 = frontier_from_urls(
            self.spark, seed_urls, round_no=0, salt_buckets=self.config.salt_buckets
        )
        self.catalog.append("frontier", f0, 0)

    def bootstrap_from_config(
        self,
        run_ts=None,
        extra_urls: list[str] | None = None,
        extra_urls_df: DataFrame | None = None,
    ):
        """Write frontier Δ(0) from the config's OWN expanded task list —
        the full reference lifecycle (config.create_crawler_tasks ->
        crawl, config.rs:46-100): vars x params expansion, template bind,
        canonical query strings, GET/POST routing; every task row keeps
        its method/body_params/timeouts through the round into the fetch
        stage.

        ``extra_urls_df`` (e.g. sitemap-declared pages from
        operators/sitemaps.discover_sitemap_pages — any DataFrame with a
        ``url`` column, or already identity-shaped with url_canon/
        url_hash/host/salt_bucket) unions into Δ(0) as plain GET seeds —
        request fields null -> stage defaults, the same union the
        per-round frontier write uses for discoveries. The union is fully
        distributed: a 50k-sitemaps x 50k-locs index never touches the
        driver. ``extra_urls`` (small driver-side list) remains for
        explicit hand-seeded runs. Returns the written Δ(0)."""
        from datetime import datetime as _dt

        from raven_spark.expansion import tasks_df
        from raven_spark.plans.round import (
            frontier_from_tasks,
            frontier_from_urls,
            frontier_identity,
        )

        run_ts = run_ts or _dt.now(timezone.utc)
        tasks = tasks_df(self.spark, self.config, run_ts)
        f0 = frontier_from_tasks(tasks, round_no=0, salt_buckets=self.config.salt_buckets)
        if extra_urls:
            extra = frontier_from_urls(
                self.spark, extra_urls, round_no=0,
                salt_buckets=self.config.salt_buckets,
            )
            f0 = f0.unionByName(extra, allowMissingColumns=True)
        if extra_urls_df is not None:
            extra = frontier_identity(
                extra_urls_df, round_no=0, salt_buckets=self.config.salt_buckets
            )
            f0 = f0.unionByName(extra, allowMissingColumns=True)
        self.catalog.append("frontier", f0, 0)
        return f0

    def run_round(self, round_no: int) -> dict:
        """Execute one round; returns its stats (also committed to the
        manifest). Idempotent: re-running a crashed round overwrites its
        own deltas only."""
        t0 = time.time()
        phase_ms: dict[str, int] = {}

        def _mark(name: str, since: float) -> float:
            now = time.time()
            phase_ms[name] = int((now - since) * 1000)
            return now

        frontier_delta = self.catalog.read("frontier", upto_round=round_no)
        if frontier_delta is None:
            return {"tasks": 0, "empty": True}
        ttl = self.opt.seen_ttl_rounds
        if self.opt.revalidate and round_no > 0:
            # recrawl half 2 (pairs with seen_ttl_rounds): attach the
            # latest prior capture's validators so a re-opened URL costs a
            # 304 instead of a body. The read is WINDOWED to the last
            # 2*ttl rounds: a URL revalidated at round k expired at most
            # ttl rounds ago, so its latest capture is >= k-2*ttl unless
            # re-discovery lagged a full TTL — and a missed validator only
            # costs a plain 200 refetch, never a wrong result. Without the
            # bound this scan is O(rounds) per round, O(rounds^2) per
            # crawl. At 10^10 keep an incremental (url_hash, etag,
            # last-modified) validators table instead — same join,
            # O(urls-revalidated) smaller input (http.py docstring).
            from raven_spark.operators.http import with_conditional_headers

            reval_lo = max(0, round_no - 2 * ttl) if ttl is not None else None
            prior = self.catalog.read(
                "pages", upto_round=round_no - 1, from_round=reval_lo
            )
            if prior is not None and "response_headers" in prior.columns:
                frontier_delta = with_conditional_headers(frontier_delta, prior)
        frontier_delta = frontier_delta.filter(F.col("round") == round_no).drop("round")

        tr = time.time()
        self._refresh_robots(frontier_delta, round_no)
        if self.opt.robots_fetcher is not None:
            _mark("robots_refresh", tr)
        # rules + crawl-delay budget overrides for THIS round, read back
        # from the robots table (broadcast-joined downstream while
        # O(hosts) stays small; swap to a key-partitioned join when the
        # rules side outgrows the broadcast threshold)
        from raven_spark.operators.politeness import effective_budget_col

        robots = self._robots_for_round(round_no)
        host_budgets = effective_budget_col(
            robots, self.config.effective_host_budget()
        )

        url_seen = None
        bloom = None
        seen_lo = max(0, round_no - ttl) if ttl is not None else None
        if round_no > 0:
            url_seen = self.catalog.read(
                "url_seen", upto_round=round_no - 1, from_round=seen_lo
            )
            if url_seen is not None:
                url_seen = url_seen.drop("round")
            if self.opt.bloom_shards:
                table = "cuckoo" if self.opt.seen_filter == "cuckoo" else "bloom"
                shards_df = self.catalog.read(
                    table, upto_round=round_no - 1, from_round=seen_lo
                )
                if shards_df is not None:
                    if "round" in shards_df.columns:
                        shards_df = shards_df.drop("round")
                    # merge the per-round shard deltas ONCE per round and
                    # checkpoint: the round probes the filter twice (the
                    # in-round subtract + the discovery-dedup in
                    # _w_frontier), and without this each probe re-shuffles
                    # and re-ORs O(rounds) deltas — O(rounds^2) merge bytes
                    # over a long crawl
                    from raven_spark.operators.seen import (
                        merge_bloom_shards,
                        merge_cuckoo_shards,
                    )

                    merge = merge_cuckoo_shards if table == "cuckoo" else merge_bloom_shards
                    shards_df = merge(shards_df).localCheckpoint(eager=False)
                    cls = ShardedCuckoo if table == "cuckoo" else ShardedBloom
                    bloom = cls(shards_df, self.opt.bloom_shards)
            else:
                bloom = self._merged_bloom(round_no - 1, from_round=seen_lo or 0)

        plan = plan_round(
            frontier_delta,
            url_seen,
            self.fetcher,
            round_no,
            host_budget=self.config.effective_host_budget(),
            bloom=bloom,
            robots=robots,
            shuffle_partitions=self.opt.shuffle_partitions,
            host_budgets=host_budgets,
            max_retry=self.config.request.max_retry,
            input_charset=self.config.request.encoding_in,
            output_charset=self.config.request.encoding_out,
        )
        crawl_ts = datetime.now(timezone.utc).isoformat()
        tp = time.time()

        from raven_spark.operators.metrics import crawler_metrics, run_summary

        # -- materialize: the pages write IS the materializing action ---------
        # At 100 TB you never cache fetch bodies in executor memory: the
        # round's full fetch output (incl. discovered links) is written to
        # the primary sink once, then every derived table projects from the
        # COLUMN-PRUNED re-read of that delta (text reads only the text
        # column, metrics only the small columns, discovery only links).
        # Only the small `staged` frontier set stays cached (plan.cached).
        results = plan.results
        persist_errors: list[str] = []
        sinks = [self.catalog, *self.opt.extra_sinks]
        t_persist = time.time()
        pages_delta = None
        # caches to release when the round ends, HOWEVER it ends — released
        # on the happy path AND before each deliberate raise below, so
        # neither the all-sinks-failed error nor a derived-write error
        # leaks plan.cached / the degraded-path persist into a retried round
        round_caches: list = list(plan.cached or [])

        def _release_caches() -> None:
            while round_caches:
                round_caches.pop().unpersist()

        try:
            self.catalog.append("pages", results, round_no)
            pages_delta = self.catalog.read("pages", upto_round=round_no).filter(
                F.col("round") == round_no
            ).drop("round")
        except Exception as e:  # noqa: BLE001 — sink errors are data (P1)
            persist_errors.append(f"pages sink {type(self.catalog).__name__}: {e}")
        if pages_delta is None:
            # Degraded path (primary sink down): persist() the fetch output
            # ONCE so the extra sinks + six derived jobs all share a single
            # execution. Fanning out over the live plan would re-execute
            # the whole fetch stage per job — with HttpFetcher that
            # refetches every URL over the network several times (breaking
            # per-URL-once politeness) and lets text/metrics/frontier be
            # computed from DIFFERENT executions than the persisted pages.
            pages_delta = results.persist()
            round_caches.append(pages_delta)
        for sink in self.opt.extra_sinks:
            try:
                # extra sinks copy the materialized delta (cheap re-read of
                # the primary write, or the degraded-path cache)
                sink.append("pages", pages_delta, round_no)
            except Exception as e:  # noqa: BLE001
                persist_errors.append(f"pages sink {type(sink).__name__}: {e}")
        if len(persist_errors) == len(sinks):
            _release_caches()
            raise RuntimeError(f"all sinks failed (code 1000): {persist_errors}")
        persist_ms = int((time.time() - t_persist) * 1000)
        tp = _mark("pages_write", tp)

        # -- derived writes: independent projections, one Spark job each, -----
        # submitted CONCURRENTLY from driver threads so their fixed
        # per-job scheduling cost overlaps (FAIR scheduler in session.py).
        text_delta = (
            pages_delta.filter(F.col("result_code") == 200)
            .select(F.col("url_canon").alias("url"), "text")
        )
        seen_delta = plan.seen_delta

        def _w_text():
            self.catalog.append("text", text_delta, round_no)

        def _w_metrics():
            self.catalog.append(
                "metrics",
                crawler_metrics(pages_delta, self.config.name, round_no, crawl_ts),
                round_no,
            )

        def _w_seen():
            self.catalog.append("url_seen", seen_delta, round_no)

        def _w_bloom():
            if self.opt.bloom_shards:
                # the round's shard-filter delta is a TABLE append: built
                # distributed, merged distributed at read time — no bitmap
                # ever transits or resides on the driver
                if self.opt.seen_filter == "cuckoo":
                    shards = build_cuckoo_shards(
                        seen_delta, "url_hash", self.opt.bloom_shards,
                        expected_n=self.opt.expected_total_urls,
                    )
                    self.catalog.append("cuckoo", shards, round_no)
                    return
                shards = build_bloom_shards(
                    seen_delta, "url_hash", self.opt.bloom_shards,
                    expected_n=self.opt.expected_total_urls, fpp=self.opt.bloom_fpp,
                )
                self.catalog.append("bloom", shards, round_no)
                return
            bloom_delta = build_bloom(
                seen_delta, "url_hash",
                expected_n=self.opt.expected_total_urls, fpp=self.opt.bloom_fpp,
            )
            self.catalog.write_blob(self._bloom_relpath(round_no), bloom_delta.to_bytes())

        def _w_frontier():
            discovered = discovered_frontier(
                pages_delta, round_no, salt_buckets=self.config.salt_buckets,
                max_depth=self.opt.max_depth,
            )
            # discovery-time dedup: subtract everything seen up to AND
            # including this round before the delta is ever written — the
            # dedup runs here, concurrent with the other derived writes,
            # instead of on the next round's critical path, and Δ(k+1)
            # shrinks to genuinely-new urls. Two-part subtract:
            #   (a) prior rounds: Bloom-pruned exact anti-join via
            #       subtract_seen — the merged round Bloom (already on the
            #       driver) eliminates ~(1-fpp) of re-discovered URLs
            #       map-side, so the shuffle against the 10^10-row seen
            #       table is proportional to NEW urls, same as in-round;
            #   (b) this round's own delta: exact anti-join (the round
            #       Bloom sidecar is still being built concurrently by
            #       _w_bloom, and both sides are O(round), not O(corpus)).
            # The in-round subtract still runs (deferred rows + races),
            # but over an already-thin delta.
            from raven_spark.operators.seen import subtract_seen

            # with a recrawl TTL the delta feeds round_no+1, whose seen
            # window starts one round later than this round's — re-read
            # with the shifted lower bound so re-discovered URLs that
            # expire NEXT round stay in the frontier. The (wider-window)
            # round Bloom stays valid as a prune: a superset filter only
            # adds anti-join work, never drops a live row.
            seen_for_next = url_seen
            if ttl is not None and round_no > 0:
                seen_for_next = self.catalog.read(
                    "url_seen",
                    upto_round=round_no - 1,
                    from_round=max(0, round_no + 1 - ttl),
                )
                if seen_for_next is not None:
                    seen_for_next = seen_for_next.drop("round")
            discovered = subtract_seen(discovered, seen_for_next, bloom)
            discovered = discovered.join(
                seen_delta.select("url_hash").distinct(), on="url_hash", how="left_anti"
            )
            # deferred rows may carry per-row request fields (config-seeded
            # runs); discovered rows get nulls for them -> stage defaults
            self.catalog.append(
                "frontier",
                discovered.unionByName(plan.deferred, allowMissingColumns=True),
                round_no + 1,
            )

        def _summary():
            return run_summary(pages_delta).first()

        jobs = {
            "text_write": _w_text,
            "metrics_write": _w_metrics,
            "seen_write": _w_seen,
            "bloom_build": _w_bloom,
            "frontier_write": _w_frontier,
            "summary": _summary,
        }
        outs: dict = {}
        job_ms: dict[str, int] = {}

        def _timed(name, fn):
            def run():
                t = time.time()
                try:
                    return fn()
                finally:
                    job_ms[name] = int((time.time() - t) * 1000)
            return run

        with ThreadPoolExecutor(max_workers=len(jobs)) as pool:
            futs = {name: pool.submit(_timed(name, fn)) for name, fn in jobs.items()}
            errs = []
            for name, fut in futs.items():
                try:
                    outs[name] = fut.result()
                except Exception as e:  # noqa: BLE001
                    errs.append(f"{name}: {e}")
            if errs:
                _release_caches()
                raise RuntimeError(f"round {round_no} derived writes failed: {errs}")
        phase_ms.update(job_ms)
        srow = outs["summary"]
        n_fetched = int(srow["tasks"] or 0)
        tp = _mark("derived_writes", tp)

        if (
            self.opt.compact_every
            and round_no > 0
            and round_no % self.opt.compact_every == 0
        ):
            # compact BEFORE the round commits, bounded at round_no-1: a
            # crash mid-compaction re-runs this round, whose own delta
            # dirs are then re-appended — excluding them from the merge
            # keeps that re-append from duplicating rows already folded
            # into a segment. The orphan/retry behavior of compact()
            # itself is crash-consistent (see catalog.compact).
            tcomp = time.time()
            # fold the doomed round dirs' Bloom sidecars into the standing
            # segment blob BEFORE compaction deletes them. _merged_bloom
            # already unions the existing segment blob, so this is the
            # full [0, round_no-1] union; OR is idempotent, so a crash
            # between this write and compact() just re-merges harmlessly,
            # and the blob is only ever a superset prune (never lossy).
            if not self.opt.bloom_shards:
                seg_bloom = self._merged_bloom(round_no - 1)
                if seg_bloom is not None:
                    self.catalog.write_blob(
                        self._SEG_BLOOM_RELPATH, seg_bloom.to_bytes()
                    )
            tables = ["url_seen", "frontier", "robots"]
            if self.opt.bloom_shards:
                tables.append("cuckoo" if self.opt.seen_filter == "cuckoo" else "bloom")
            for t in tables:
                self.catalog.compact(t, upto_round=round_no - 1)
            phase_ms["compaction"] = int((time.time() - tcomp) * 1000)

        stats = {
            "tasks": n_fetched,
            "failed": int(srow["failed"] or 0),
            "succeeded": int(srow["succeeded"] or 0),
            "persist_errors": persist_errors,
            "persist_ms": persist_ms,
            "avg_fetch_ms": float(srow["avg_fetch_ms"] or 0.0),
            "round_wall_s": round(time.time() - t0, 3),
            "phase_ms": phase_ms,
            "crawl_ts": crawl_ts,
        }
        _release_caches()
        self._commit_round(round_no, stats)
        return stats

    def run(self, seed_urls: list[str] | None = None, max_rounds: int | None = None) -> list[dict]:
        """Fresh run (seeds given) or continuation. Stops when the frontier
        delta is empty or max_rounds reached."""
        if seed_urls is not None:
            self.bootstrap(seed_urls)
        max_rounds = max_rounds or self.config.max_rounds
        start = (self.last_completed_round() or -1) + 1
        all_stats = []
        try:
            for k in range(start, max_rounds):
                stats = self.run_round(k)
                all_stats.append(stats)
                if stats.get("empty") or stats["tasks"] == 0:
                    break
        except Exception as e:  # noqa: BLE001 — abort is an error-level event
            # (runner.rs:78 notifies Error on failure; state is committed
            # per-round, so resume() continues from the crash point)
            self.notify("error", f"[{self.config.name}] crawl aborted", str(e)[:500])
            raise
        self._notify_run(all_stats)
        return all_stats

    def notify(self, level: str, label: str, message: str) -> None:
        """Leveled notify fan-out (S1): always logged; delivered through
        ``opt.notify_poster`` for every config notify method whose level
        matches the event's level exactly (instances.rs:93-100)."""
        import logging

        log = logging.getLogger("raven_spark")
        log.log(
            {"error": logging.ERROR, "warn": logging.WARNING}.get(level, logging.INFO),
            "%s %s", label, message,
        )
        if self.opt.notify_poster is None:
            return
        for m in self.config.notify_methods:
            if m.level != level:
                continue
            try:
                self.opt.notify_poster(m, level, label, message)
            except Exception as e:  # noqa: BLE001 — notify failures never kill a run
                log.warning("notify method %s failed: %s", m.kind, e)

    def _notify_run(self, all_stats: list[dict]) -> None:
        """Run-summary side channel (S1/M4, runner.rs:113-155): counts +
        failures + persist errors formatted once per run; delivered to the
        engine log always, and to the injected notify callback (the Slack
        seam, notify_method.rs:17-66) when configured."""
        import logging

        summary = {
            "name": self.config.name,
            "rounds": len(all_stats),
            "tasks": sum(s.get("tasks", 0) for s in all_stats),
            "failed": sum(s.get("failed", 0) for s in all_stats),
            "persist_errors": [e for s in all_stats for e in s.get("persist_errors", [])],
            "wall_s": round(sum(s.get("round_wall_s", 0.0) for s in all_stats), 3),
        }
        message = (
            f"[{summary['name']}] finished crawling: "
            f"{summary['tasks']} tasks in {summary['rounds']} rounds, "
            f"{summary['failed']} failed, "
            f"{len(summary['persist_errors'])} persist errors, "
            f"{summary['wall_s']}s"
        )
        # completion is an info-level event (runner.rs:154 notify_info) —
        # an error-level Slack method stays silent on clean completions
        self.notify("info", "raven command is completed.", message)
        if self.opt.notify is not None:
            try:
                self.opt.notify(message, summary)
            except Exception as e:  # noqa: BLE001 — notify failures never kill a run
                logging.getLogger("raven_spark").warning("notify failed: %s", e)

    def resume(self, max_rounds: int | None = None) -> list[dict]:
        """Continue from the first uncommitted round (crash recovery)."""
        return self.run(seed_urls=None, max_rounds=max_rounds)

    # -- inspection -----------------------------------------------------------------

    def table(self, name: str, upto_round: int | None = None) -> DataFrame | None:
        return self.catalog.read(name, upto_round)

"""Single-process reference crawler — the crawl-order ORACLE.

Mirrors the engine's round semantics (plans/round.py + operators/fetch.py)
in plain sequential Python, the way the reference's single-threaded
default (max_threads=1, config.rs:37-39) executes: no Spark, no
partitioning, every step a loop. The e2e oracle test asserts the
distributed engine reproduces this crawler's crawl order (canonical
tuple), final URL-seen set, and byte-identical extracted text
(BASELINE.json metric: "identical crawl order + URL-seen set ...
byte-identical extracted text per url").

Uses the SAME pinned kernels as the engine (canonicalize_url,
extract_text/links, convert_and_decode, behavior model) and a pure-Python
XXH64 equal to Spark's xxhash64 — so any divergence localizes to the
DATAFLOW, not the kernels.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from raven_spark.functions.charset import convert_and_decode
from raven_spark.functions.hashing import spark_xxhash64_str
from raven_spark.functions.text import extract_links, extract_text
from raven_spark.functions.urls import canonicalize_url, url_host


@dataclass
class RefState:
    crawl_order: list = field(default_factory=list)  # (round, priority, host_hash, rank, url_canon)
    url_seen: set = field(default_factory=set)       # url_hash
    text: dict = field(default_factory=dict)         # url_canon -> extracted text
    codes: dict = field(default_factory=dict)        # url_canon -> result_code


def _identity(url: str, salt_buckets: int = 256):
    canon = canonicalize_url(url)
    if canon is None:
        return None
    h = spark_xxhash64_str(canon)
    host = url_host(canon)
    hh = spark_xxhash64_str(host) if host is not None else None
    return canon, h, host, hh


def crawl_reference(
    corpus_rows,
    seeds,
    host_budget: int,
    max_rounds: int,
    max_retry: int = 0,
    behavior_fn=None,
    salt_buckets: int = 256,
) -> RefState:
    """corpus_rows: iterable of (url_canon, html_bytes, charset);
    behavior_fn: url_hash ndarray -> behavior codes (SyntheticFetcher's)."""
    corpus = {u: (bytes(b), cs) for u, b, cs in corpus_rows}
    if behavior_fn is None:
        behavior_fn = lambda a: np.zeros(len(a), dtype=np.int64)  # noqa: E731

    st = RefState()
    # frontier rows: dict url_hash -> (priority, depth, round_added, deferred_count, url, canon, host, host_hash)
    frontier: dict[int, tuple] = {}
    for u in seeds:
        ident = _identity(u)
        if ident is None:
            continue
        canon, h, host, hh = ident
        row = (100, 0, 0, 0, u, canon, host, hh)
        if h not in frontier or row < frontier[h]:
            frontier[h] = row  # min-struct dedup, canonical order

    for round_no in range(max_rounds):
        if not frontier:
            break
        # subtract seen
        cand = {h: r for h, r in frontier.items() if h not in st.url_seen}
        # politeness: rank per host by (priority, depth, url_hash)
        by_host: dict[str, list] = {}
        for h, (pri, dep, ra, dc, url, canon, host, hh) in cand.items():
            by_host.setdefault(host, []).append((pri, dep, h))
        scheduled: list[tuple] = []   # (pri, dep, url_hash, rank)
        deferred: dict[int, tuple] = {}
        for host, rows in by_host.items():
            rows.sort()
            for rank, (pri, dep, h) in enumerate(rows, start=1):
                if rank <= host_budget:
                    scheduled.append((h, rank))
                else:
                    pri0, dep0, ra0, dc0, url0, canon0, host0, hh0 = cand[h]
                    deferred[h] = (max(pri0 - 1, 0), dep0, round_no + 1, dc0 + 1,
                                   url0, canon0, host0, hh0)
        # the WHOLE round's scheduled set becomes seen before any
        # discovery check (engine semantics: discovered links anti-join
        # the seen set including this round's delta)
        next_frontier: dict[int, tuple] = dict(deferred)
        hashes = np.array([h for h, _ in scheduled], dtype=np.int64)
        st.url_seen.update(int(h) for h in hashes)
        behs = behavior_fn(hashes) if len(hashes) else np.array([], dtype=np.int64)
        for (h, rank), beh in zip(scheduled, behs):
            pri, dep, ra, dc, url, canon, host, hh = cand[h]
            st.crawl_order.append((round_no, pri, hh, rank, canon))
            body = corpus.get(canon)
            if body is None or beh == 3:
                st.codes[canon] = 400
                continue
            if beh in (1, 2) and max_retry < 1:
                st.codes[canon] = 500 if beh == 1 else 600
                continue
            if beh == 4:
                st.codes[canon] = 500
                continue
            if beh == 5:
                st.codes[canon] = 800
                continue
            raw, cs = body
            html_str, _conv, _a = convert_and_decode(raw, cs, "utf-8")
            st.codes[canon] = 200
            st.text[canon] = extract_text(html_str)
            # discovery
            for link in extract_links(html_str):
                ident = _identity(link)
                if ident is None:
                    continue
                lcanon, lh, lhost, lhh = ident
                if lh in st.url_seen:
                    continue
                row = (pri + 1, dep + 1, round_no + 1, 0, link, lcanon, lhost, lhh)
                if lh not in next_frontier or row < next_frontier[lh]:
                    next_frontier[lh] = row
        frontier = next_frontier
    return st

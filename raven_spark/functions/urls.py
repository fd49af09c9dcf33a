"""RFC-3986 URL canonicalization + host extraction + dedup hashing.

The reference never canonicalizes URLs at all — its query strings are even
emitted in nondeterministic HashMap order (crawler.rs:178-192), and its own
tests assert set-membership, not order (config.rs:204-211). At 10^10-URL
scale an un-canonicalized frontier is a correctness bug (the same page
enters the seen-set under 8 spellings), so this module defines the
engine's *canonical URL spec*:

  1. scheme and host lowercased                      (RFC 3986 §6.2.2.1)
  2. percent-escapes uppercased, unreserved chars decoded      (§6.2.2.2)
  3. dot-segments removed from the path                        (§6.2.2.3)
  4. default ports stripped (http:80, https:443)               (§6.2.3)
  5. empty path -> "/"                                         (§6.2.3)
  6. query parameters sorted by (key, value); bare "?" dropped
  7. fragment dropped
  8. remaining non-ASCII / unsafe bytes percent-encoded (uppercase hex)

Rule 6 replaces the reference's unordered query construction with a
deterministic total order; rule 7 matches crawler semantics (fragments are
client-side). ``canonicalize_url`` is the pure-Python spec;
``canonicalize_udf`` is its Arrow-batched pandas UDF. Dedup identity is
``xxhash64(url_canon)`` via Spark's built-in (JVM, codegen'd) — no Python
hashing in the hot path.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# --- pure-Python spec ------------------------------------------------------

_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
# bytes legal to leave raw in path / query (sub-delims + : @ / and ? = & for query)
_PATH_SAFE = _UNRESERVED | set("!$&'()*+,;=:@/")
_QUERY_SAFE = _PATH_SAFE | set("?")

_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21", "ws": "80", "wss": "443"}

_SCHEME_RE = re.compile(r"^([a-zA-Z][a-zA-Z0-9+.-]*):")
_PCT_RE = re.compile(r"%([0-9a-fA-F]{2})")


def _renorm_pct(component: str, safe: set[str]) -> str:
    """Uppercase %XX escapes, decode unreserved, re-encode unsafe raw bytes.

    Single tokenizing pass (idempotence-critical): each input position is
    consumed exactly once — a valid ``%XX`` escape is decoded (if unreserved)
    or re-emitted uppercased; a bare/invalid ``%`` becomes the literal
    ``%25``; raw chars are kept (safe) or percent-encoded (UTF-8 bytes).
    Decoded characters are emitted directly to the output and never
    re-scanned, so no pass can fabricate a new apparent escape out of a
    dangling ``%`` plus a later-decoded digit (the round-1 idempotence bug).
    """
    out: list[str] = []
    i = 0
    n = len(component)
    while i < n:
        ch = component[i]
        if ch == "%":
            m = _PCT_RE.match(component, i)
            if m:
                byte = int(m.group(1), 16)
                dec = chr(byte)
                out.append(dec if dec in _UNRESERVED else "%%%02X" % byte)
                i += 3
            else:
                out.append("%25")  # invalid escape: '%' means literal percent
                i += 1
            continue
        if ch in safe:
            out.append(ch)
        else:
            out.extend("%%%02X" % b for b in ch.encode("utf-8"))
        i += 1
    return "".join(out)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments, exactly."""
    output: list[str] = []
    while path:
        if path.startswith("../"):
            path = path[3:]
        elif path.startswith("./"):
            path = path[2:]
        elif path.startswith("/./"):
            path = "/" + path[3:]
        elif path == "/.":
            path = "/"
        elif path.startswith("/../"):
            path = "/" + path[4:]
            if output:
                output.pop()
        elif path == "/..":
            path = "/"
            if output:
                output.pop()
        elif path in (".", ".."):
            path = ""
        else:
            if path.startswith("/"):
                slash = path.find("/", 1)
            else:
                slash = path.find("/")
            if slash == -1:
                output.append(path)
                path = ""
            else:
                output.append(path[:slash])
                path = path[slash:]
    return "".join(output)


def canonicalize_url(url: str | None) -> str | None:
    """The canonical-URL spec (pure Python; the pandas UDF wraps this).

    Returns None for None/empty input and for URLs without a parseable
    scheme+authority — callers treat those as frontier rejects, not errors
    (errors are data, result.rs:11-29).
    """
    if url is None:
        return None
    url = url.strip()
    if not url:
        return None
    m = _SCHEME_RE.match(url)
    if not m:
        return None
    scheme = m.group(1).lower()
    rest = url[m.end() :]
    if not rest.startswith("//"):
        return None
    rest = rest[2:]

    # split off fragment (dropped), then query
    frag = rest.find("#")
    if frag != -1:
        rest = rest[:frag]
    qpos = rest.find("?")
    query = rest[qpos + 1 :] if qpos != -1 else None
    if qpos != -1:
        rest = rest[:qpos]
    # authority / path split
    slash = rest.find("/")
    if slash == -1:
        authority, path = rest, ""
    else:
        authority, path = rest[:slash], rest[slash:]

    # userinfo passes through (rare; kept verbatim except host casing)
    userinfo = ""
    at = authority.rfind("@")
    if at != -1:
        userinfo, authority = authority[: at + 1], authority[at + 1 :]
    # port
    port = ""
    if authority.startswith("["):  # IPv6 literal
        close = authority.find("]")
        host = authority[: close + 1].lower()
        tail = authority[close + 1 :]
        if tail.startswith(":"):
            port = tail[1:]
    else:
        colon = authority.rfind(":")
        if colon != -1 and authority[colon + 1 :].isdigit():
            host, port = authority[:colon], authority[colon + 1 :]
        else:
            host, port = authority, ""
        host = host.lower().rstrip(".")
    if port:
        port = port.lstrip("0") or "0"
        if _DEFAULT_PORTS.get(scheme) == port:
            port = ""
    if not host:
        return None

    path = _renorm_pct(path, _PATH_SAFE)
    path = _remove_dot_segments(path)
    if not path:
        path = "/"

    canon = scheme + "://" + userinfo + host + ((":" + port) if port else "") + path
    if query:
        parts = query.split("&")
        pairs = []
        for p in parts:
            if not p:
                continue
            pairs.append(_renorm_pct(p, _QUERY_SAFE))
        # rule 6: deterministic total order on (key, value) — replaces the
        # reference's HashMap-order query strings (crawler.rs:187-189)
        pairs.sort(key=lambda kv: (kv.split("=", 1)[0], kv))
        if pairs:
            canon += "?" + "&".join(pairs)
    return canon


def url_host(url_canon: str | None) -> str | None:
    """Registrable host of an already-canonical URL (cheap split)."""
    if not url_canon:
        return None
    try:
        rest = url_canon.split("://", 1)[1]
    except IndexError:
        return None
    authority = rest.split("/", 1)[0]
    at = authority.rfind("@")
    if at != -1:
        authority = authority[at + 1 :]
    if authority.startswith("["):
        return authority[: authority.find("]") + 1]
    return authority.split(":", 1)[0]


# --- Arrow-batched UDFs ----------------------------------------------------


@pandas_udf(T.StringType())
def canonicalize_udf(urls: pd.Series) -> pd.Series:
    """Vectorized canonicalization. The common fast path (already-canonical
    lowercase http(s) URL, no traps) is detected with vectorized pandas str
    ops and passed through untouched; only trap rows pay the per-element
    spec function. At crawl scale >95% of discovered URLs hit the fast path.
    """
    s = urls.astype("object")
    tail = urls.str.replace(r"^https?://", "", regex=True)
    mask_fast = (
        urls.notna()
        & (tail != urls)  # scheme matched, already lowercase
        & tail.str.match(
            r"^[a-z0-9-]+(?:\.[a-z0-9-]+)*/[!$&'()*+,;=:@a-zA-Z0-9\-._~/]*$"
        ).fillna(False)
        # no empty segments ("//") and no "." / ".." segments in the path
        & ~tail.str.contains(r"//|/\.(?:[./]|$)", regex=True).fillna(True)
    ).astype(bool)
    out = pd.Series([None] * len(s), index=s.index, dtype="object")
    out[mask_fast] = s[mask_fast]
    slow_idx = ~mask_fast
    if slow_idx.any():
        out[slow_idx] = [canonicalize_url(u) for u in s[slow_idx]]
    return out


# host extraction on canonical URLs is pure string algebra -> keep it JVM-side
def _authority_col(url_canon: Column) -> Column:
    """authority (host[:port], userinfo stripped) of a canonical URL."""
    authority = F.split_part(F.split_part(url_canon, F.lit("://"), F.lit(2)), F.lit("/"), F.lit(1))
    return F.element_at(F.split(authority, "@"), -1)


def _host_of_authority(no_user: Column) -> Column:
    return F.when(
        F.startswith(no_user, F.lit("[")),
        F.concat(F.split_part(no_user, F.lit("]"), F.lit(1)), F.lit("]")),
    ).otherwise(F.split_part(no_user, F.lit(":"), F.lit(1)))


def _port_of_authority(no_user: Column) -> Column:
    """port suffix ('' when none) — canonicalize already strips default
    ports, so a remaining port is origin-significant."""
    return F.when(
        F.startswith(no_user, F.lit("[")),
        F.split_part(no_user, F.lit("]:"), F.lit(2)),
    ).otherwise(F.split_part(no_user, F.lit(":"), F.lit(2)))


def host_col(url_canon: Column) -> Column:
    """Host of a canonical URL as a built-in-functions column (codegen'd)."""
    return _host_of_authority(_authority_col(url_canon))


def url_hash_col(url_canon: Column) -> Column:
    """Dedup identity: xxhash64 of the canonical URL (Spark built-in)."""
    return F.xxhash64(url_canon)


def with_url_identity(df, url_col: str = "url", salt_buckets: int = 256):
    """Standard identity columns for any URL-bearing DataFrame:

    url_canon, url_hash, host, host_hash, salt_bucket.

    ``salt_bucket = pmod(xxhash64(host), salt_buckets)`` is the skew-kill
    partitioning key mandated by BASELINE.json north_rule: a Zipf-heavy
    host (one host = 20% of the frontier) lands in ONE hash partition
    under plain repartition(host); salting by host-hash bucket count keeps
    every partition bounded while preserving host locality per bucket.
    """
    df = df.withColumn("url_canon", canonicalize_udf(F.col(url_col)))
    df = df.filter(F.col("url_canon").isNotNull())
    df = (
        df.withColumn("url_hash", url_hash_col(F.col("url_canon")))
        .withColumn("host", host_col(F.col("url_canon")))
        .withColumn("host_hash", F.xxhash64(F.col("host")))
        .withColumn("salt_bucket", F.pmod(F.col("host_hash"), F.lit(salt_buckets)).cast("int"))
    )
    return df


def surt_col(url_canon: Column) -> Column:
    """SURT key (Sort-friendly URI Reordering Transform — the public
    Common-Crawl/OpenWayback index key form): reverse the host labels,
    join with commas, append ")" + path?query, drop the scheme and a
    leading "www.".

        https://www.example.com/a/b?x=1 -> com,example)/a/b?x=1

    Why it exists at 10^10 URLs: lexicographic order on the SURT clusters
    a registrable domain's every subdomain/page into one contiguous key
    range, so "everything under example.com" is a RANGE predicate — a
    sorted/range-partitioned index (CDX-style) answers it with partition
    pruning instead of a full scan, and sorting a capture table by SURT
    gives the host locality that makes per-host politeness and per-domain
    rollups near-shuffle-free. Pure built-in column algebra over the
    ALREADY-canonical URL (run canonicalize first; ports and userinfo are
    normalized there). IPv6 literals keep their bracket form unreversed
    (label-reversal is only meaningful for DNS names).
    """
    rest = F.split_part(url_canon, F.lit("://"), F.lit(2))
    authority = F.split_part(rest, F.lit("/"), F.lit(1))
    no_user = F.element_at(F.split(authority, "@"), -1)
    host = _host_of_authority(no_user)
    port = _port_of_authority(no_user)
    host = F.when(F.startswith(host, F.lit("www.")), F.substring(host, 5, 2**30)) \
        .otherwise(host)
    reversed_host = F.when(
        F.startswith(host, F.lit("[")), host  # IPv6: no label semantics
    ).otherwise(F.array_join(F.reverse(F.split(host, r"\.")), ","))
    # a surviving (non-default) port is part of the origin: keep it in the
    # key, real-SURT style ('com,example:8080)/...'), so distinct origins
    # never collapse onto one range
    with_port = F.when(
        port != "", F.concat(reversed_host, F.lit(":"), port)
    ).otherwise(reversed_host)
    path_q = F.substring(rest, F.length(authority) + 1, 2**30)
    path_q = F.when(path_q == "", F.lit("/")).otherwise(path_q)
    return F.concat(with_port, F.lit(")"), path_q)


def trap_score_col(url_canon: Column) -> Column:
    """Crawler-trap likelihood in [0, 1] — the frontier's spam filter.

    Infinite URL spaces (calendar pages, session ids, faceted search,
    path loops) will eat any politeness budget; production crawlers
    score-and-deprioritize rather than hard-block. Four classic signals,
    each from the public crawler-trap literature (Heritrix's path-repeat
    rule, session-id query heuristics), all pure column algebra:

    - deep paths:           depth > 6 (each extra level +0.1, cap 0.3)
    - repeated segment:     any path segment occurring 3+ times (0.3)
    - long digit runs:      8+ consecutive digits anywhere (0.2)
    - session-y params:     query keys like sessionid/sid/phpsessid (0.2)

    Compose with apply_host_priority-style demotion or a threshold
    filter; the score is deterministic so the same URL always lands the
    same side of the gate.
    """
    rest = F.split_part(url_canon, F.lit("://"), F.lit(2))
    path = F.split_part(F.substring(rest, F.instr(rest, "/"), 2**30), F.lit("?"), F.lit(1))
    segs = F.filter(F.split(path, "/"), lambda s: s != "")
    depth = F.size(segs)
    deep = F.least(
        F.greatest(depth - F.lit(6), F.lit(0)).cast("double") * F.lit(0.1), F.lit(0.3)
    )
    # a segment repeating 3+ times: distinct count drops by >= 2
    repeated = F.when(
        (depth >= 3) & (depth - F.size(F.array_distinct(segs)) >= 2), F.lit(0.3)
    ).otherwise(F.lit(0.0))
    digits = F.when(
        url_canon.rlike("[0-9]{8,}"), F.lit(0.2)
    ).otherwise(F.lit(0.0))
    session = F.when(
        url_canon.rlike(r"[?&](sessionid|session_id|sid|phpsessid|jsessionid)="),
        F.lit(0.2),
    ).otherwise(F.lit(0.0))
    return F.round(F.least(deep + repeated + digits + session, F.lit(1.0)), 6)


def host_suffixes_col(host: Column, max_labels: int = 8) -> Column:
    """Dot-suffixes of a DNS name, shortest first:
    'a.b.example.com' -> ['com', 'example.com', 'b.example.com',
    'a.b.example.com']. Blocklist entries are short (registrable domains,
    <= 4-5 labels in practice), so the SHORT suffixes are the ones that
    match; hosts deeper than ``max_labels`` emit their ``max_labels``
    shortest suffixes PLUS the full host, so an exact-host blocklist
    entry still matches no matter how deep the name is. Domain-blocklist
    membership then reduces to "any suffix in the blocked set", which is
    how UT1-style category lists define a block ('example.com' blocks
    every subdomain). IPv6 literals have no label semantics: one-element
    list (exact-match only)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    sfx = F.transform(
        F.sequence(F.lit(1), F.least(n, F.lit(max_labels))),
        lambda i: _label_suffix(labels, n, i),
    )
    capped = F.when(
        n > F.lit(max_labels), F.concat(sfx, F.array(host))
    ).otherwise(sfx)
    return F.when(F.startswith(host, F.lit("[")), F.array(host)).otherwise(capped)


def url_filter(
    df,
    blocked_domains: tuple[str, ...] = (),
    badwords: tuple[str, ...] = (),
    url_col: str = "url_canon",
    host_col_name: str | None = None,
    blocked_df=None,
    id_col: str = "url_hash",
):
    """Crawl-side URL filtering (the FineWeb/RefinedWeb §3.1 "URL
    filtering" stage; UT1-blacklist-style domain categories): flags every
    row with

    - ``blocked_domain``: the URL's host, or ANY parent domain of it, is
      in the blocklist (subdomain-inclusive match via host_suffixes_col)
    - ``url_badword``: the lowercased URL contains a blocklisted word as
      an alphanumeric token (path/query/host all count — 'badword' in
      '/download/badword/x' hits; substrings inside longer tokens do not)
    - ``url_allowed``: neither flag — the frontier-admission verdict

    Two blocklist paths, chosen by size (COMBINABLE — passing both ORs
    the verdicts, for a UT1 base list plus an ad-hoc config tuple):
    - ``blocked_domains`` (tuple): the list ships as a literal array in
      the plan — zero shuffles, zero joins, fused into the scan. Right
      for config-sized lists (up to ~10^4 domains).
    - ``blocked_df`` (DataFrame with a ``domain`` column): UT1-scale
      lists (millions of rows) stay distributed — suffixes explode to
      (id, suffix) pairs, a semi join marks blocked ids, one left join
      keyed on the 8-byte ``id_col`` brings the flag back (the input
      MUST carry that column on this path). The suffix side is
      O(rows x labels) 2-column tuples; URL text never re-shuffles.
      Spark broadcasts the blocklist side automatically while it fits,
      and falls back to a shuffle join beyond that.

    Blocklist entries are normalized (lowercase, trailing dot stripped)
    before matching — canonical hosts are always lowercase, so a
    mixed-case UT1 entry would otherwise be a silent no-op.

    Flags, not a split — same auditability posture as clean_corpus
    (compose with robots_flag / trap_score_col at frontier admission).
    """
    url = F.col(url_col)
    host = F.col(host_col_name) if host_col_name else host_col(url)
    sfx = host_suffixes_col(host)
    blocked_flag = F.lit(False)
    if blocked_df is not None:
        exploded = df.select(
            F.col(id_col).alias("__id"), F.explode(sfx).alias("__sfx")
        )
        norm_dom = F.lower(F.rtrim(F.col("domain"), F.lit(".")))
        blocked_ids = (
            exploded.join(
                blocked_df.select(norm_dom.alias("__sfx")), "__sfx", "leftsemi"
            )
            .select("__id")
            .distinct()
            .withColumn("__blocked", F.lit(True))
        )
        out = df.join(
            blocked_ids, df[id_col] == blocked_ids["__id"], "left"
        ).drop("__id")
        blocked_flag = F.coalesce(F.col("__blocked"), F.lit(False))
    else:
        out = df
    if blocked_domains:
        lit_blocked = F.array(
            *[F.lit(d.lower().rstrip(".")) for d in blocked_domains]
        )
        blocked_flag = blocked_flag | F.arrays_overlap(sfx, lit_blocked)
    out = out.withColumn("blocked_domain", blocked_flag)
    if blocked_df is not None:
        out = out.drop("__blocked")
    if badwords:
        toks = F.split(F.lower(url), "[^a-z0-9]+")
        bad = F.arrays_overlap(toks, F.array(*[F.lit(w) for w in badwords]))
    else:
        bad = F.lit(False)
    return out.withColumn("url_badword", bad).withColumn(
        "url_allowed", ~F.col("blocked_domain") & ~F.col("url_badword")
    )


def _label_suffix(labels: Column, n: Column, i) -> Column:
    """The i-label dot-suffix of a label array ('a.b.c', i=2 -> 'b.c')."""
    return F.array_join(F.slice(labels, n - i + 1, i), ".")


def _psl_best_col(
    host: Column,
    suffixes: tuple[str, ...],
    wildcards: tuple[str, ...],
    exceptions: tuple[str, ...],
    max_labels: int,
):
    """(labels, n, best) where best = label count of the public suffix
    under publicsuffix.org's algorithm: a matching exception rule
    PREVAILS and the public suffix is that rule minus its leftmost label;
    otherwise the LONGEST match among exact rules, wildcard expansions,
    and the implicit '*' prevailing rule (best = 0 only for a
    single-label exception match — not a thing in the real PSL, where
    every exception demotes to a covering multi-label rule)."""

    def _lits(items, strip):
        if not items:
            return F.array().cast("array<string>")
        return F.array(*[F.lit(s.lower().strip(strip)) for s in items])

    exact_arr = _lits(suffixes, ".")
    wild_arr = _lits(wildcards, "*. ")
    exc_arr = _lits(exceptions, "!. ")
    labels = F.split(host, r"\.")
    n = F.size(labels)

    def _base(i: Column) -> Column:
        s_i = _label_suffix(labels, n, i)
        return (
            F.array_contains(exact_arr, s_i)
            | (i == 1)
            | ((i > 1) & F.array_contains(
                wild_arr, _label_suffix(labels, n, i - 1)))
        )

    def _exc(i: Column) -> Column:
        return F.array_contains(exc_arr, _label_suffix(labels, n, i))

    idx = F.sequence(F.lit(1), F.least(n, F.lit(max_labels)))
    exc_best = F.aggregate(
        idx, F.lit(0),
        lambda acc, i: F.when(_exc(i), F.greatest(acc, i)).otherwise(acc),
    )
    base_best = F.aggregate(
        idx, F.lit(0),
        lambda acc, i: F.when(_base(i), F.greatest(acc, i)).otherwise(acc),
    )
    best = F.when(exc_best > 0, exc_best - 1).otherwise(base_best)
    return labels, n, best


def registered_domain_col(
    host: Column,
    suffixes: tuple[str, ...] = (),
    wildcards: tuple[str, ...] = (),
    exceptions: tuple[str, ...] = (),
    max_labels: int = 8,
) -> Column:
    """Registrable domain (pay-level domain) of a canonical host under
    public-suffix-list semantics (publicsuffix.org's algorithm): the
    public suffix is the LONGEST matching rule, and the registrable
    domain is that suffix plus exactly one more label.

    Rule classes, mirroring the PSL format:
    - ``suffixes``:   exact rules ('com', 'co.uk', 'kawasaki.jp')
    - ``wildcards``:  the BASE of '*.x' rules — pass 'ck' for '*.ck'
                      (any (k+1)-label suffix whose k-label parent is in
                      the set is public)
    - ``exceptions``: '!' rules ('www.ck' for '!www.ck') — a matching
                      exception PREVAILS over every other rule and the
                      public suffix is the exception minus its leftmost
                      label (so '!www.ck' makes 'www.ck' registrable)
    - the PSL's implicit prevailing rule '*' applies: with no matching
      rule the TLD itself is the public suffix, so an empty config
      degrades to 'registrable = last two labels'.

    Returns NULL when the host IS a public suffix (nothing registrable —
    PSL convention), for IPv6 bracket literals (no label semantics), and
    for single-label hosts; politeness/rollup callers should
    ``coalesce(registered_domain, host)`` so those rows still group.

    Why this exists at 10^10 URLs: per-HOST politeness under-throttles
    platforms that spread one origin across subdomains ({a,b,c}.shop.example
    is one server farm), and domain-level rollups (FineWeb-style URL
    stats, UT1 blocklists) are keyed by registrable domain, not host.
    Pure column algebra — the rule sets ship as plan literals (the real
    PSL is ~9k rules, well inside literal-array territory), zero
    shuffles, zero UDFs; scoring is per-row over at most ``max_labels``
    suffixes (PSL rules are <= 5 labels in practice; document-deep hosts
    only ever match short rules).
    """
    labels, n, best = _psl_best_col(host, suffixes, wildcards, exceptions, max_labels)
    pld = F.when(
        (n > best) & (best > 0), _label_suffix(labels, n, best + 1)
    ).otherwise(F.lit(None).cast("string"))
    return F.when(F.startswith(host, F.lit("[")), F.lit(None).cast("string")) \
        .otherwise(pld)


def public_suffix_col(
    host: Column,
    suffixes: tuple[str, ...] = (),
    wildcards: tuple[str, ...] = (),
    exceptions: tuple[str, ...] = (),
    max_labels: int = 8,
) -> Column:
    """The public suffix itself (longest matching PSL rule; implicit '*'
    -> the TLD). NULL for IPv6 literals. Same rule-set contract as
    registered_domain_col."""
    labels, n, best = _psl_best_col(host, suffixes, wildcards, exceptions, max_labels)
    ps = F.when(best > 0, _label_suffix(labels, n, best)).otherwise(
        F.lit(None).cast("string")
    )
    return F.when(F.startswith(host, F.lit("[")), F.lit(None).cast("string")) \
        .otherwise(ps)


# --- URL template mining (crawler-trap cluster detection) ---------------------


def url_template_col(url: Column) -> Column:
    """Collapse a URL's path to its structural template: strip scheme/
    authority/query/fragment, lowercase, then replace long hex runs
    (>= 8 chars — session tokens, content hashes; an 8+-digit run is
    also hex and collapses in this pass) with ``{hex}`` and remaining
    digit runs with ``{n}``. Two URLs share a template iff they differ
    only in those identifier slots — the grouping key for spotting
    machine-generated URL spaces (calendars, session mirrors, faceted
    listings) that trap_score_col scores one URL at a time.

    Pure column algebra (three regexes + a split), so the 100 TB pass
    is a zero-shuffle scan and the DuckDB oracle replays it exactly
    (RE2-safe patterns, no lookarounds)."""
    path = F.element_at(
        F.split(
            F.element_at(F.split(F.regexp_replace(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", ""), r"\#"), 1),
            r"\?",
        ),
        1,
    )
    path = F.lower(F.when(path == "", F.lit("/")).otherwise(path))
    t = F.regexp_replace(path, r"[0-9a-f]{8,}", "{hex}")
    return F.regexp_replace(t, r"[0-9]+", "{n}")


def template_host_col(url: Column) -> Column:
    """Host key for template mining/enforcement: authority minus
    userinfo and port, lowercased — the same host definition
    ``host_col`` gives canonical URLs (so the template deny key and
    url_filter's domain key agree on what 'one site' means), expressed
    as one RE2-safe regex so the DuckDB oracles replay it verbatim."""
    return F.lower(
        F.regexp_extract(
            url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#]*@)?([^/?#:]*)", 1
        )
    )


def mine_url_templates(
    df, url_col: str = "url", min_urls: int = 20, min_slots: int = 2
):
    """Group a frontier/corpus URL set by (host, path template) and flag
    trap-suspect clusters: templates with >= ``min_slots`` identifier
    slots whose population reached ``min_urls`` (a calendar or session
    mirror inflates exactly this way — many URLs, one shape). Output per
    template: n_urls, n_distinct_urls, n_slots, depth, trap_suspect.

    One map-side-combinable hash aggregate keyed on (host, template) —
    the shuffle carries templates (bounded short strings), never URL
    lists; the verdict is exact integer algebra. Feed ``trap_suspect``
    templates into the frontier's deny-list the same way q42 feeds host
    reputation."""
    url = F.col(url_col)
    host = template_host_col(url)
    tpl = url_template_col(url)
    agg = (
        # distinct URLs ride xxhash64 (8-byte shuffle keys, the q72/
        # domain_rollup convention) — full URL strings never leave the
        # map stage; collision odds are the accepted exact-dedup class
        df.select(host.alias("host"), tpl.alias("template"), F.xxhash64(url).alias("u"))
        .groupBy("host", "template")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct("u").alias("n_distinct_urls"),
        )
    )
    n_slots = (
        F.length(F.regexp_replace(F.col("template"), r"\{hex\}|\{n\}", "\x01"))
        - F.length(F.regexp_replace(F.col("template"), r"\{hex\}|\{n\}", ""))
    )
    depth = F.length(F.regexp_replace(F.col("template"), r"[^/]", ""))
    return agg.select(
        "host",
        "template",
        "n_urls",
        "n_distinct_urls",
        n_slots.cast("int").alias("n_slots"),
        depth.cast("int").alias("depth"),
        (
            # verdict on DISTINCT urls: a single hot URL rediscovered
            # min_urls times in an undeduped delta is popularity, not a
            # trap — only a POPULATION of distinct siblings flags
            (F.col("n_distinct_urls") >= int(min_urls))
            & (n_slots >= int(min_slots))
        ).alias("trap_suspect"),
    )


def page_directives(df, html_col: str = "html", id_col: str = "doc_id"):
    """In-page indexing directives — the page-level counterpart of the
    robots.txt gate (RFC 9309 covers the server; these cover the
    DOCUMENT): <meta name="robots"> noindex/nofollow, the
    rel="canonical" URL, and hreflang alternate-language links.

    A real crawl pipeline needs all three BEFORE corpus admission:
    noindex pages must not enter the training corpus (the publisher
    said no), nofollow gates outlink discovery, rel=canonical
    re-keys near-identical capture URLs onto one identity (the
    crawler-side twin of content dedup — feed it to url_seen/admission
    as the identity override), and hreflang ties together the
    translation cluster bitext mining (q73) wants as candidates.

    Pure codegen'd column algebra: one tag-scoped regexp_extract per
    directive (RE2-safe — no backrefs/lookahead, so the SQL twin runs
    the same patterns), attribute order inside a tag doesn't matter
    (the attr is re-extracted from the MATCHED tag, not the page).
    Zero exchanges, fused into the scan.

    Output: (id, robots_content lower, noindex, nofollow, canonical,
    n_hreflang int, hreflang_langs sorted csv).
    """
    html = F.coalesce(F.col(html_col), F.lit(""))

    def attr(tag, name):
        # quoted value first; fall back to the unquoted form (valid and
        # common HTML: content=noindex,nofollow / href=https://... —
        # requiring a quote silently dropped those directives)
        quoted = F.regexp_extract(
            tag, r"(?i)" + name + r"\s*=\s*[\"']([^\"']*)", 1
        )
        unquoted = F.regexp_extract(
            tag, r"(?i)" + name + r"\s*=\s*([^\s\"'>]+)", 1
        )
        return F.when(quoted != "", quoted).otherwise(unquoted)

    meta_tag = F.regexp_extract(
        html, r"(?i)<meta\b[^>]*name\s*=\s*[\"']?robots[\"']?[^>]*>", 0
    )
    robots = F.lower(attr(meta_tag, "content"))
    canon_tag = F.regexp_extract(
        html, r"(?i)<link\b[^>]*rel\s*=\s*[\"']?canonical[\"']?[^>]*>", 0
    )
    canonical = attr(canon_tag, "href")
    hl_tags = F.regexp_extract_all(
        html, F.lit(r"(?i)<link\b[^>]*hreflang\s*=\s*[\"']?[^\"'>\s]+[^>]*>"), F.lit(0)
    )
    langs = F.transform(
        hl_tags,
        lambda t: F.lower(
            F.regexp_extract(t, r"(?i)hreflang\s*=\s*[\"']?([^\"'>\s]+)", 1)
        ),
    )
    return df.select(
        F.col(id_col).alias("id"),
        robots.alias("robots_content"),
        robots.contains("noindex").alias("noindex"),
        robots.contains("nofollow").alias("nofollow"),
        F.when(canonical != "", canonical).alias("canonical"),
        F.size(hl_tags).cast("int").alias("n_hreflang"),
        F.array_join(F.array_sort(langs), ",").alias("hreflang_langs"),
    )


def apply_canonical_override(
    df, url_col: str = "url", canonical_col: str = "canonical"
):
    """Re-key capture URLs onto their rel=canonical identity — the
    directive-driven URL dedup step between page_directives and the
    URL-seen/frontier identity (url_seen keys, snapshot grouping,
    admission): tracking-param and mirror-path captures of one logical
    page collapse onto the publisher-declared URL BEFORE content ever
    hashes.

    Override only when SAFE: the canonical must be an absolute http(s)
    URL on the SAME HOST as the capture (a page cannot vouch for
    another site — cross-host canonicals are a classic spam/takeover
    vector, and real crawlers treat them as hints at most; same-host
    covers the ?session/?utm/slash-variant cases dedup actually
    meets). Both sides pass through the engine's RFC-3986
    canonicalizer first, so the comparison and the emitted identity
    use the exact url_canon convention the rest of the engine keys on
    (xxhash64(effective_url) IS the url_seen key).

    Scale shape: one Arrow canonicalization pass (the with_url_identity
    kernel) + pure column algebra; zero exchanges, no joins — the
    override is row-local by design.

    Output: (url, url_canon, effective_url, overridden boolean).
    """
    own = canonicalize_udf(F.col(url_col))
    tgt = canonicalize_udf(F.col(canonical_col))
    base = df.select(
        F.col(url_col).alias("url"),
        own.alias("url_canon"),
        tgt.alias("__tgt"),
    )
    host = lambda c: F.regexp_extract(c, r"^[a-z][a-z0-9+.-]*://([^/]+)", 1)
    ok = (
        F.col("__tgt").isNotNull()
        & F.col("__tgt").rlike(r"^https?://")
        & (host(F.col("__tgt")) == host(F.col("url_canon")))
    )
    # rows whose capture URL fails canonicalization stay VISIBLE with
    # NULL identity columns (the with_url_identity convention) — a
    # dropped row reads downstream as "never captured" instead of as a
    # reject the caller can route
    return base.select(
        "url",
        "url_canon",
        F.when(ok, F.col("__tgt")).otherwise(F.col("url_canon")).alias(
            "effective_url"
        ),
        F.coalesce(
            ok & (F.col("__tgt") != F.col("url_canon")), F.lit(False)
        ).alias("overridden"),
    )

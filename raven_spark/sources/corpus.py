"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1).

Schema = BASELINE.json input_hint exactly:
    url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING

Properties engineered in:
- host skew: hosts drawn Zipf(1.2) — one hot host takes a large share of
  pages, exercising the salt-bucket partitioning (north_rule)
- canonicalization traps: outlink hrefs embed uppercase scheme/host,
  default ports, dot-segments, trailing "?", %7E escapes, fragments — the
  pages table itself keys on the CANONICAL url
- multi-charset: ja pages encode shift_jis / euc-jp, ru pages
  windows-1251, with matching <meta charset> and Content-Type — mirrors
  the reference charset set (charset.rs:13-53)
- outlinks: each page links 0-5 other pages (deterministic web graph), so
  multi-round crawls discover new frontier
- ``text`` is the golden extraction of ``html`` via the SAME pinned
  extractor the fetch stage uses -> the byte-identical invariant is
  testable end-to-end

Generation is distributed (spark.range -> mapInPandas) and *per-row
deterministic from (seed, page id)* — independent of partitioning, so any
two runs at any parallelism produce identical bytes. Generator Python cost
is test infrastructure, not the crawl hot path.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from raven_spark.functions.text import extract_text

EPOCH_2026 = pd.Timestamp("2026-01-01T00:00:00Z")

_M64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 — the per-row deterministic RNG."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & _M64
    z = x
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _M64
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _M64
    return z ^ (z >> np.uint64(31))


def _hash_stream(ids: np.ndarray, stream: int, seed: int) -> np.ndarray:
    return _splitmix64(
        ids.astype(np.uint64) ^ np.uint64(seed * 0x9E3779B1) ^ (np.uint64(stream) << np.uint64(48))
    )


def _unit(ids: np.ndarray, stream: int, seed: int) -> np.ndarray:
    """uniform [0,1) per id, per stream."""
    return (_hash_stream(ids, stream, seed) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


_LANGS = ["en", "ja", "ru", "de"]
_LANG_CHARSETS = {"en": "utf-8", "ja": "shift_jis", "ru": "windows-1251", "de": "utf-8"}
# euc-jp for a slice of ja pages (two JP charsets like the reference set)
_WORDS = {
    "en": ("the quick crawl engine reads many small pages and writes the "
           "extracted text back to the lake while the frontier keeps order").split(),
    "de": ("der schnelle crawler liest viele seiten und die warteschlange "
           "bleibt geordnet denn die daten sind nicht klein").split(),
    "ja": "クロール エンジン は 多数 の ページ を 読み 取り 本文 を 抽出 します".split(),
    "ru": "краулер читает много страниц и записывает текст обратно в озеро данных".split(),
}


def zipf_host_cdf(n_hosts: int, alpha: float = 1.2) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, n_hosts + 1, dtype=np.float64), alpha)
    return np.cumsum(w) / w.sum()


def canon_url(i: int, host: int) -> str:
    return f"https://host{host}.example/p/{i}"


_TRAPS = [
    lambda u: u,  # clean
    lambda u: u.replace("https://", "HTTPS://").replace("host", "HOST", 1),
    lambda u: u.replace(".example/", ".example:443/"),
    lambda u: u.replace("/p/", "/p/x/../"),
    lambda u: u + "?",
    lambda u: u + "#frag",
    lambda u: u.replace("/p/", "/%70/"),  # %70 = 'p' (unreserved-adjacent decode trap)
    lambda u: u.replace("/p/", "/p/./"),
]


def messy_url(i: int, host: int, trap: int) -> str:
    return _TRAPS[trap % len(_TRAPS)](canon_url(i, host))


def _gen_batch(ids: np.ndarray, n_pages: int, n_hosts: int, seed: int,
               size_factor: int = 1) -> pd.DataFrame:
    cdf = zipf_host_cdf(n_hosts)
    hosts = np.searchsorted(cdf, _unit(ids, 1, seed), side="right")
    langs_ix = (_hash_stream(ids, 2, seed) % np.uint64(len(_LANGS))).astype(np.int64)
    n_links = (_hash_stream(ids, 3, seed) % np.uint64(6)).astype(np.int64)
    n_sents = (3 + (_hash_stream(ids, 4, seed) % np.uint64(8)).astype(np.int64)) * size_factor

    rows = []
    for k in range(len(ids)):
        i = int(ids[k])
        host = int(hosts[k])
        lang = _LANGS[langs_ix[k]]
        words = _WORDS[lang]
        # deterministic body sentences
        widx = _hash_stream(np.arange(int(n_sents[k]) * 8, dtype=np.uint64) + np.uint64(i * 131), 5, seed)
        toks = [words[int(w % np.uint64(len(words)))] for w in widx]
        sents = [" ".join(toks[j * 8 : (j + 1) * 8]).capitalize() + "." for j in range(int(n_sents[k]))]
        # outlinks: deterministic targets + trap spellings
        links = []
        for li in range(int(n_links[k])):
            t = int(_hash_stream(np.array([i * 37 + li], dtype=np.uint64), 6, seed)[0] % np.uint64(n_pages))
            t_host = int(np.searchsorted(cdf, float(_unit(np.array([t], dtype=np.uint64), 1, seed)[0]), side="right"))
            trap = int(_hash_stream(np.array([i * 53 + li], dtype=np.uint64), 7, seed)[0] % np.uint64(len(_TRAPS)))
            links.append(messy_url(t, t_host, trap))
        charset = _LANG_CHARSETS[lang]
        if lang == "ja" and i % 3 == 0:
            charset = "euc-jp"
        body_html = "".join(f"<p>{s}</p>\n" for s in sents)
        links_html = "".join(f'<li><a href="{u}">link {j}</a></li>\n' for j, u in enumerate(links))
        html_str = (
            "<!DOCTYPE html>\n<html>\n<head>\n"
            f'<meta charset="{charset}">\n'
            f"<title>Page {i} on host{host}</title>\n"
            "<style>body { color: black; }</style>\n"
            "<script>var ignored = 1;</script>\n"
            "</head>\n<body>\n"
            f"<h1>Page {i}</h1>\n{body_html}<ul>\n{links_html}</ul>\n"
            "</body>\n</html>\n"
        )
        text = extract_text(html_str)
        html_bytes = html_str.encode(
            {"shift_jis": "shift_jis", "euc-jp": "euc-jp", "windows-1251": "cp1251", "utf-8": "utf-8"}[charset],
            errors="replace",
        )
        rows.append(
            (
                canon_url(i, host),
                EPOCH_2026 + pd.Timedelta(seconds=i % 86400, days=i % 30),
                html_bytes,
                text,
                lang,
                f"host{host}.example",
                charset,
            )
        )
    return pd.DataFrame(
        rows, columns=["url", "warc_ts", "html", "text", "lang", "host", "charset"]
    )


PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string, "
    "host string, charset string"
)


def generate_pages(spark, n_pages: int, n_hosts: int | None = None, seed: int = 42,
                   size_factor: int = 1):
    """Distributed deterministic corpus. ``host``/``charset`` are extra
    convenience columns beyond the input_hint five; select them away for
    strict-schema consumers. ``size_factor`` scales page body length
    (factor 1 ~ 0.4 KB html; factor 50 ~ 20 KB — Common-Crawl-realistic)."""
    n_hosts = n_hosts or max(8, n_pages // 200)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].to_numpy()
            yield _gen_batch(ids, n_pages, n_hosts, seed, size_factor)

    # one range partition per ~8k pages keeps generation parallel & bounded
    parts = max(1, min(256, n_pages // 8192 + 1))
    return spark.range(0, n_pages, numPartitions=parts).mapInPandas(gen, PAGES_SCHEMA)


def seed_urls(n_seeds: int, n_pages: int, n_hosts: int | None = None, seed: int = 42) -> list[str]:
    """Round-0 seed list: messy spellings of the first ``n_seeds`` page ids
    (same trap schedule as outlinks, so seeds exercise canonicalization)."""
    n_hosts = n_hosts or max(8, n_pages // 200)
    cdf = zipf_host_cdf(n_hosts)
    ids = np.arange(n_seeds, dtype=np.uint64)
    hosts = np.searchsorted(cdf, _unit(ids, 1, seed), side="right")
    traps = _hash_stream(ids, 8, seed) % np.uint64(len(_TRAPS))
    return [messy_url(int(i), int(hosts[k]), int(traps[k])) for k, i in enumerate(ids)]

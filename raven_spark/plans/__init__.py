"""Round plans: each crawl round is a pure DataFrame -> DataFrame function
(frontier scan -> canonicalize/hash -> Bloom prune -> anti-join ->
politeness window -> fetch -> extract -> deltas). The engine loop in
``raven_spark.engine`` materializes the deltas via the catalog.
"""

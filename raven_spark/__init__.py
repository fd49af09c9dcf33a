"""raven_spark — a PySpark-native crawl frontier + fetch scheduler.

A from-scratch re-expression of the crawl semantics of ``tsuboshy/raven``
(reference at /root/reference, Rust) as idiomatic Spark dataflow:

- a *crawl round* is a pure DataFrame -> DataFrame function over five
  tables: ``frontier``, ``url_seen``, ``pages``, ``robots``, ``metrics``
- URL-seen membership is a per-partition Bloom filter merged on the driver
  and broadcast to prune before an exact anti-join
- politeness is a per-host window-function token bucket (never a sleep)
- the fetch stage is an Arrow-batched ``mapInPandas`` with the reference's
  retry matrix (crawler.rs:25-148) and charset pipeline (result.rs:120-131)
- errors are data (result_code column, result.rs:32-40), never exceptions

Nothing here is a port: the reference is a single-process thread-pool
crawler; this package is declarative Spark, designed for a 10^10-URL
frontier on a multi-executor cluster.
"""

__version__ = "0.1.0"

from raven_spark.session import get_spark  # noqa: F401

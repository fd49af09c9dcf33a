from raven_spark.streaming.ingest import (
    host_rate_metrics,
    read_pages_stream,
    streaming_link_frontier,
)

__all__ = ["read_pages_stream", "streaming_link_frontier", "host_rate_metrics"]

"""Relational + crawl operators: URL-seen membership (Bloom + anti-join),
politeness token buckets, the Arrow-batched fetch stage, metrics
projections, dedup families, and similarity search.
"""

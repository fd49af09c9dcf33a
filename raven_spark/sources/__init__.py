"""Sources & sinks: the pluggable table catalog (Iceberg-shaped contract,
Parquet fallback in-sandbox) and the deterministic synthetic web corpus.
"""

"""Scalar/vectorized functions: URL canonicalization, text kernels,
charset + MIME handling. Everything exposed here is either a built-in
``pyspark.sql.functions`` composition (JVM-side, codegen'd) or an
Arrow-batched pandas UDF — never row-at-a-time Python UDFs.
"""

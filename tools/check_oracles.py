"""Self-check harness mimicking the driver's correctness gate:

For every queries() entry with an oracle_sql() twin, run the Spark query
and the DuckDB SQL on the same parquet tables and compare row count,
column names, and an order-insensitive value multiset (floats normalized
to 9 significant digits to absorb representation noise — the driver's
value-hash is expected to be at least this strict, so exact match here is
the bar).

Usage: python tools/check_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import sys
from datetime import date, datetime
from decimal import Decimal

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_val(v):
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if v != v:
            return "nan"
        return format(v, ".9g")
    if isinstance(v, (datetime, date)):
        return str(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_val(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from raven_spark.session import get_spark

    spark = get_spark("oracle_check", cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error {str(e)[:200]}")
            continue
        if sql is None:
            print(f"rows  {name}: {len(s_rows)} rows (no oracle)")
            if len(s_rows) == 0 and name != "q05_customers_without_orders":
                print(f"      WARNING {name} returned 0 rows")
            continue
        try:
            res = con.execute(sql)
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL  {name}: duckdb error {str(e)[:200]}")
            continue
        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if not problems:
            a = norm_rows(s_cols, s_rows)
            b = norm_rows(d_cols, d_rows)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL  {name}: {'; '.join(p[:300] for p in problems)}")
        else:
            print(f"OK    {name}: {len(s_rows)} rows match")
    print()
    if failures:
        print(f"{len(failures)} FAILURES")
        sys.exit(1)
    print("all oracle checks passed")


if __name__ == "__main__":
    main()

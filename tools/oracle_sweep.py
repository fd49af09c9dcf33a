"""Full-sweep correctness artifact in the driver's exact format.

The driver's CORRECTNESS_r{N}.json caps at 50 entries, leaving
q51-q153 with no official correctness row (VERDICT r4, "What's
missing" #1). This tool runs EVERY queries() entry against its
oracle_sql() twin at the given scale factor and writes a JSON artifact
with the driver's per-query shape:

    {"qNN_name": {"rows_match": bool|null, "schema_match": bool|null,
                  "hash_match": bool|null, "spark_rows": int|null,
                  "oracle_rows": int|null, "err": str|null}, ...}

plus a trailing "__summary__" entry (green/total counts, sf, duration).
No-oracle queries record the driver's rows-only shape (err =
"no_oracle"). Comparison semantics mirror tools/check_oracles.py:
column sets must match, row multisets compare order-insensitively with
floats normalized to 9 significant digits (the driver's value-hash is
at least this strict).

Usage: python tools/oracle_sweep.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from tools.check_oracles import TABLES, norm_rows  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/ORACLE_SWEEP_r5.json"

    import __spark_entry__ as entrymod
    from raven_spark.session import get_spark

    spark = get_spark("oracle_sweep", cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    out: dict = {}
    t_start = time.time()
    n_green = n_rows_only = n_red = 0
    for name, fn in qs.items():
        entry = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        sql = oracles.get(name)
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            entry["spark_rows"] = len(s_rows)
        except Exception as e:  # noqa: BLE001
            entry["err"] = f"spark: {str(e)[:300]}"
            out[name] = entry
            n_red += 1
            print(f"FAIL  {name}: {entry['err']}")
            continue
        if sql is None:
            entry["err"] = "no_oracle"
            out[name] = entry
            n_rows_only += 1
            print(f"rows  {name}: {len(s_rows)} rows (no oracle)")
            continue
        try:
            res = con.execute(sql)
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
            entry["oracle_rows"] = len(d_rows)
        except Exception as e:  # noqa: BLE001
            entry["err"] = f"duckdb: {str(e)[:300]}"
            out[name] = entry
            n_red += 1
            print(f"FAIL  {name}: {entry['err']}")
            continue
        entry["rows_match"] = len(s_rows) == len(d_rows)
        entry["schema_match"] = sorted(s_cols) == sorted(d_cols)
        if entry["rows_match"] and entry["schema_match"]:
            entry["hash_match"] = norm_rows(s_cols, s_rows) == norm_rows(
                d_cols, d_rows
            )
        else:
            entry["hash_match"] = False
        out[name] = entry
        ok = entry["rows_match"] and entry["schema_match"] and entry["hash_match"]
        n_green += int(bool(ok))
        n_red += int(not ok)
        print(f"{'OK   ' if ok else 'FAIL '} {name}: {len(s_rows)} rows")
    out["__summary__"] = {
        "sf_dir": sf_dir,
        "total": len(qs),
        "all_green": n_green,
        "rows_only": n_rows_only,
        "red": n_red,
        "wall_s": round(time.time() - t_start, 1),
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"\nwrote {out_path}: {n_green} green, {n_rows_only} rows-only, {n_red} red")
    if n_red:
        sys.exit(1)


if __name__ == "__main__":
    main()

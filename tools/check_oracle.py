#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Reads verify-dump parquet per query + oracle_sql.json, runs each oracle in
DuckDB over the same sf tables, and compares (columns sorted by name,
values compared exactly; rows compared as written — both sides emit a
total ORDER BY). Reports per-query status. Dev tool only (driver-side
python is available per the environment notes); not part of the engine.
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as ds

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return float(v)
    except Exception:
        pass
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        try:
            spark_tbl = ds.dataset(f"{out_dir}/{name}").to_table()
        except Exception as e:
            results[name] = f"NO_SPARK_OUTPUT {e}"
            continue
        try:
            duck = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {str(e).splitlines()[0][:160]}"
            continue
        s_cols = sorted(spark_tbl.column_names)
        d_cols = sorted(duck.column_names)
        if s_cols != d_cols:
            results[name] = f"SCHEMA_NAMES spark={s_cols} duck={d_cols}"
            continue
        s_rows = [tuple(norm(spark_tbl.column(c)[i].as_py()) for c in s_cols)
                  for i in range(spark_tbl.num_rows)]
        d_rows = [tuple(norm(duck.column(c)[i].as_py()) for c in d_cols)
                  for i in range(duck.num_rows)]
        # driver may or may not re-sort rows; we compare sorted multisets AND
        # as-written order to know both
        if s_rows == d_rows:
            results[name] = "OK"
        elif sorted(map(repr, s_rows)) == sorted(map(repr, d_rows)):
            results[name] = "OK_UNORDERED (row order differs!)"
        else:
            sset = {repr(r) for r in s_rows}
            dset = {repr(r) for r in d_rows}
            only_s = list(sset - dset)[:3]
            only_d = list(dset - sset)[:3]
            results[name] = (f"MISMATCH rows spark={len(s_rows)} duck={len(d_rows)}"
                             f" only_spark={only_s} only_duck={only_d}")
    ok = sum(1 for v in results.values() if v.startswith("OK"))
    for k, v in sorted(results.items()):
        flag = "PASS" if v == "OK" else ("WARN" if v.startswith("OK") else "FAIL")
        print(f"{flag:5s} {k}: {v if v != 'OK' else ''}".rstrip())
    print(f"\n{ok}/{len(results)} oracle queries match "
          f"({len(results)} with oracle; verify dirs without oracle are rows-only)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
         sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out")

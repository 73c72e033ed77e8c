#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB with views for
the parquet tables in <sfDir>, and compares against the Spark parquet output
in <verifyOutDir>/<name>/ — columns sorted by name, rows sorted, values
compared exactly (floats compared to 9 decimal places).
"""
import json
import math
import sys

import duckdb


def canon(rows, cols):
    out = []
    for row in rows:
        vals = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("NaN")
                else:
                    vals.append(f"{v:.9g}")
            elif isinstance(v, list):
                vals.append(json.dumps([f"{x:.9g}" if isinstance(x, float) else x for x in v]))
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetch_arrow_table()
            got_cols = sorted(got.column_names)
            got_rows = canon([tuple(d[c] for c in got_cols) for d in got.to_pylist()], got_cols)
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        try:
            rel = con.sql(sql)
            # The driver's bridge goes through pandas, where DuckDB HUGEINT /
            # unsigned types become float64 ("1.0" vs Spark's "1") and
            # hash-mismatch despite equal values. Arrow's to_pylist hides
            # this (HUGEINT -> python int), so guard on the DuckDB type.
            widened = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
                       if str(t) in ("HUGEINT", "UHUGEINT", "UBIGINT",
                                     "UINTEGER", "USMALLINT", "UTINYINT")]
            if widened:
                print(f"FAIL {name}: oracle column(s) {widened} would reach "
                      f"the driver as float64 — CAST to BIGINT in the SQL")
                n_fail += 1
                continue
            exp = rel.fetch_arrow_table()
            exp_cols = sorted(exp.column_names)
            exp_rows = canon([tuple(d[c] for c in exp_cols) for d in exp.to_pylist()], exp_cols)
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns spark={got_cols} oracle={exp_cols}")
            n_fail += 1
        elif got_rows != exp_rows:
            diff = [(g, e) for g, e in zip(got_rows, exp_rows) if g != e][:3]
            print(f"FAIL {name}: {len(got_rows)} vs {len(exp_rows)} rows; first diffs: {diff}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got_rows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed, {len(oracle)} total")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's correctness gate:
run graft.Verify (Spark) at a given SF dir, then run each oracle SQL in
DuckDB over the same parquet tables and compare row/schema/values.

Usage: python3 tools/check_local.py [sfdir] [outdir]
(The engine itself never depends on this file.)
"""
import json, math, sys, subprocess
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    return sorted(out)


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    sqls = json.loads((OUT / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(sqls.items()):
        pdir = OUT / name
        try:
            tbl = pq.read_table(sorted(pdir.glob("*.parquet")))
            spark_cols = tbl.column_names
            spark_rows = [tuple(r[c] for c in spark_cols) for r in tbl.to_pylist()]
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        try:
            res = con.execute(sql)
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:200]}")
            n_fail += 1
            continue
        spark_rows = [dict(zip(spark_cols, r)) for r in spark_rows]
        spark_rows = [tuple(r[c] for c in spark_cols) for r in spark_rows]
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"FAIL {name}: columns differ spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
            n_fail += 1
            continue
        a = canon_rows(spark_cols, spark_rows)
        b = canon_rows(duck_cols, duck_rows)
        if a == b:
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: rows differ (spark={len(a)}, duck={len(b)})")
            for i, (x, y) in enumerate(zip(a, b)):
                if x != y:
                    print(f"  first diff at sorted-row {i}:\n    spark={x}\n    duck ={y}")
                    break
            if len(a) != len(b):
                only_a = [r for r in a if r not in set(b)][:3]
                only_b = [r for r in b if r not in set(a)][:3]
                print(f"  only-spark: {only_a}\n  only-duck : {only_b}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

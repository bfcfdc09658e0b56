#!/usr/bin/env python3
"""Dev-only harness reproducing the driver's correctness gate.

Run graft.Verify (Spark) at a given SF dir first, then this script runs
each oracle SQL in DuckDB over the same parquet tables and compares.

FAITHFULNESS (round-6 bisection, see NOTES.md): the driver loads the
Spark result via pandas/pyarrow (parquet DECIMAL -> decimal.Decimal ->
str "0.900000", DATE -> datetime.date -> "2024-01-01") but the DuckDB
oracle via .df() (DECIMAL -> float64 -> "0.9", DATE -> all-midnight
datetime64 rendered date-only). It then compares stringified sorted
rows. This asymmetry is the whole game:

  * a DECIMAL output whose 6-dp string has trailing zeros reds the hash
    even when values are exact (r5: 44 such queries, model validated
    44/44 with zero false/missed reds against CORRECTNESS_r05.json);
  * integer / identical-IEEE double / string / date outputs are stable.

So this gate loads the two sides ASYMMETRICALLY, exactly like the
driver, and additionally reports a value-level comparison so a failure
can be classified as representation-vs-semantics.

Usage: python3 tools/check_local.py [sfdir] [outdir]
(The engine itself never depends on this file.)
"""
import json, math, sys
from decimal import Decimal
from pathlib import Path

import duckdb
import numpy as np
import pyarrow.parquet as pq

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


# ---------------------------------------------------------- driver canon

def _canon_cell(v):
    """Stringify one cell the way the driver's pandas round-trip does."""
    if v is None:
        return ""
    if isinstance(v, float):
        return "" if math.isnan(v) else repr(v)
    if isinstance(v, np.floating):
        f = float(v)
        return "" if math.isnan(f) else repr(f)
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, np.ndarray):
        return "[" + ",".join(_canon_cell(x) for x in v.tolist()) + "]"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon_cell(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)  # Decimal keeps its scale ("0.900000"); date -> "2024-01-01"


def canon_frame(df):
    """Sorted canonical rows for a pandas frame, driver-style.

    datetime64 columns whose non-null values are all midnight render
    date-only (pandas to_csv behavior — matches driver greens on
    DATE-vs-TIMESTAMP columns like q52/q54/q47)."""
    import pandas as pd
    cols = sorted(df.columns)
    rendered = {}
    for c in df.columns:
        s = df[c]
        if np.issubdtype(s.dtype, np.datetime64):
            nn = s.dropna()
            if len(nn) and (nn.dt.normalize() == nn).all():
                rendered[c] = s.dt.strftime("%Y-%m-%d").where(s.notna(), "").tolist()
            else:
                rendered[c] = s.dt.strftime("%Y-%m-%d %H:%M:%S").where(s.notna(), "").tolist()
        else:
            rendered[c] = [_canon_cell(v) for v in s.tolist()]
    return sorted(tuple(rendered[c][i] for c in cols) for i in range(len(df)))


# ------------------------------------------------- value-level (exact)

def _value_cell(v):
    """Exact value canon: Decimal/float compared numerically at full
    precision, so 'value-exact but representation-red' is detectable."""
    if v is None:
        return "null"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        d = Decimal(repr(v)).normalize()
        return str(d)
    if isinstance(v, np.floating):
        return _value_cell(float(v))
    if isinstance(v, Decimal):
        return str(v.normalize())
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, np.ndarray):
        return "[" + ",".join(_value_cell(x) for x in v.tolist()) + "]"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_value_cell(x) for x in v) + "]"
    return str(v)


def value_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_value_cell(r[i]) for i in order) for r in rows)


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
            sdf = tbl.to_pandas()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        try:
            res = con.execute(sql)
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
            ddf = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:200]}")
            n_fail += 1
            continue
        if sorted(sdf.columns) != sorted(duck_cols):
            print(f"FAIL {name}: columns differ spark={sorted(sdf.columns)} duck={sorted(duck_cols)}")
            n_fail += 1
            continue
        a = canon_frame(sdf)
        b = canon_frame(ddf)
        if a == b:
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
            continue
        # hash-red: classify as representation vs semantics
        spark_rows = [tuple(r[c] for c in tbl.column_names) for r in tbl.to_pylist()]
        va = value_rows(tbl.column_names, spark_rows)
        vb = value_rows(duck_cols, duck_rows)
        kind = "REPRESENTATION (values exact)" if va == vb else "SEMANTICS (values differ)"
        print(f"FAIL {name}: {kind} (spark={len(a)}, duck={len(b)})")
        shown = 0
        for x, y in zip(a, b):
            if x != y:
                print(f"  first hash diff:\n    spark={x}\n    duck ={y}")
                break
        if va != vb:
            for x, y in zip(va, vb):
                if x != y:
                    print(f"  first VALUE diff:\n    spark={x}\n    duck ={y}")
                    break
            if len(va) != len(vb):
                only_a = [r for r in va if r not in set(vb)][:3]
                only_b = [r for r in vb if r not in set(va)][:3]
                print(f"  only-spark: {only_a}\n  only-duck : {only_b}")
        n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

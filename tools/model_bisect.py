#!/usr/bin/env python3
"""Round-6 bisection harness: infer the driver's byte-hash comparator.

Hypothesis under test ("pandas-asymmetry model"): the driver loads the
Spark result via pandas/pyarrow (parquet DECIMAL -> decimal.Decimal,
str "0.500000") but the DuckDB oracle via .df() (DECIMAL -> float64,
str "0.5"), then compares stringified sorted rows. Under that model a
query reds iff some cell's string differs -- e.g. any 6-dp decimal
value with trailing zeros, or a double whose bits differ cross-engine.

Usage: python3 tools/model_bisect.py [outdir] [sfdir] [correctness_json]
Prints per-model confusion vs the driver's recorded verdict.
"""
import json, math, sys
from pathlib import Path
import duckdb
import pyarrow.parquet as pq

OUT = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_r6_verify")
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
CORR = Path(sys.argv[3] if len(sys.argv) > 3 else "/root/repo/CORRECTNESS_r05.json")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_cell(v):
    """str() canon with stable handling for containers/bytes/NaN."""
    if v is None:
        return "None"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    # numpy arrays from pandas
    tn = type(v).__module__
    if tn.startswith("numpy"):
        try:
            import numpy as np
            if isinstance(v, np.ndarray):
                return "[" + ",".join(canon_cell(x) for x in v.tolist()) + "]"
            return canon_cell(v.item())
        except Exception:
            pass
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon_cell(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def rows_to_canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon_cell(r[i]) for i in order) for r in rows)


def spark_rows_pandas(pdir):
    """Spark side via pandas (decimal -> decimal.Decimal objects)."""
    df = pq.read_table(sorted(pdir.glob("*.parquet"))).to_pandas()
    cols = list(df.columns)
    rows = [tuple(rec) for rec in df.itertuples(index=False, name=None)]
    return cols, rows


def duck_rows_df(con, sql):
    """Oracle side via .df() (decimal -> float64)."""
    df = con.execute(sql).df()
    cols = list(df.columns)
    rows = [tuple(rec) for rec in df.itertuples(index=False, name=None)]
    return cols, rows


def duck_rows_fetchall(con, sql):
    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    return cols, res.fetchall()


def spark_rows_pylist(pdir):
    tbl = pq.read_table(sorted(pdir.glob("*.parquet")))
    cols = tbl.column_names
    rows = [tuple(r[c] for c in cols) for r in tbl.to_pylist()]
    return cols, rows


MODELS = {
    # driver = pandas(spark parquet) vs duckdb .df()
    "pandas_vs_df": (spark_rows_pandas, duck_rows_df),
    # both object-level (what r5's theory assumed)
    "pylist_vs_fetchall": (spark_rows_pylist, duck_rows_fetchall),
    # spark pandas vs duck fetchall
    "pandas_vs_fetchall": (spark_rows_pandas, duck_rows_fetchall),
}


def main():
    actual = json.loads(CORR.read_text())
    red_actual = {k for k, v in actual.items() if not v.get("hash_match")}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    sqls = json.loads((OUT / "oracle_sql.json").read_text())

    verdicts = {m: {} for m in MODELS}
    first_diff = {m: {} for m in MODELS}
    for name, sql in sorted(sqls.items()):
        pdir = OUT / name
        for mname, (sfn, dfn) in MODELS.items():
            try:
                scols, srows = sfn(pdir)
                dcols, drows = dfn(con, sql)
                a = rows_to_canon(scols, srows)
                b = rows_to_canon(dcols, drows)
                verdicts[mname][name] = (a == b)
                if a != b:
                    for x, y in zip(a, b):
                        if x != y:
                            first_diff[mname][name] = (x, y)
                            break
            except Exception as e:
                verdicts[mname][name] = f"ERR:{str(e)[:80]}"

    for mname in MODELS:
        v = verdicts[mname]
        pred_red = {k for k, r in v.items() if r is not True}
        fp = sorted(pred_red - red_actual)      # model reds, driver greened
        fn = sorted(red_actual - pred_red)      # model greens, driver redded
        print(f"\n=== model {mname}: predicted-red={len(pred_red)}  actual-red={len(red_actual)}")
        print(f"  false-red  ({len(fp)}): {fp}")
        print(f"  missed-red ({len(fn)}): {fn}")
        if mname == "pandas_vs_df":
            for k in sorted(pred_red & red_actual)[:6]:
                d = first_diff[mname].get(k)
                if d:
                    print(f"  ex {k}:\n    spark={d[0][:160]}\n    duck ={d[1][:160]}")


if __name__ == "__main__":
    main()

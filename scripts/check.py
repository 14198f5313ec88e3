#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (dev tool only; the
shipped library is pure Scala). Usage:

    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 scripts/check.py /root/testdata/sf0.01 /tmp/verify_out

Loads each Spark result parquet, runs the paired oracle SQL in DuckDB
over the same testdata parquet tables, sorts columns by name and rows
by all columns, and compares values exactly."""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = f"{out_dir}/{name}"
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(f"{qdir}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files \
            else pd.DataFrame()
        if name not in oracle:
            print(f"  [rows-only] {name}: {len(got)} rows "
                  f"{'OK' if len(got) > 0 else 'EMPTY!'}")
            continue
        try:
            want = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"  [FAIL-oracle] {name}: {e}")
            n_fail += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"  [FAIL-schema] {name}: spark={list(g.columns)} "
                  f"duck={list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"  [FAIL-rows] {name}: spark={len(g)} duck={len(w)}")
            n_fail += 1
            continue
        mismatch = []
        for c in g.columns:
            gc, wc = g[c], w[c]
            if str(gc.dtype).startswith("datetime") or \
               str(wc.dtype).startswith("datetime"):
                gc, wc = pd.to_datetime(gc), pd.to_datetime(wc)
                if getattr(gc.dt, "tz", None) is not None:
                    gc = gc.dt.tz_localize(None)
                if getattr(wc.dt, "tz", None) is not None:
                    wc = wc.dt.tz_localize(None)
                gc = gc.astype("datetime64[us]")
                wc = wc.astype("datetime64[us]")
            eq = (gc.values == wc.values) | (gc.isna().values & wc.isna().values)
            if not eq.all():
                i = int((~eq).argmax())
                mismatch.append(f"{c}[row{i}]: spark={gc.iloc[i]!r} "
                                f"duck={wc.iloc[i]!r}")
        if mismatch:
            print(f"  [FAIL-values] {name}: {'; '.join(mismatch[:3])}")
            n_fail += 1
        else:
            dt = ""
            for c in g.columns:
                if str(g[c].dtype) != str(w[c].dtype):
                    dt += f" ({c}: {g[c].dtype} vs {w[c].dtype})"
            print(f"  [PASS] {name}: {len(g)} rows{dt}")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (dev tool only; the
shipped library is pure Scala). Usage:

    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 scripts/check.py /root/testdata/sf0.01 /tmp/verify_out

Loads each Spark result parquet, runs the paired oracle SQL in DuckDB
over the same testdata parquet tables, sorts columns by name and rows
by all columns, and compares values exactly.

Besides the stdout report, writes a machine artifact
CORRECTNESS_local.json (same per-query schema as the driver's gate:
{name: {"status": "pass"|"fail-..."|"rows-only", "rows": N}}) next to
this script's repo root, and exits NON-ZERO if the artifact would be
empty — round 12's driver artifact was a 2-byte `{}` and nothing
repo-side noticed; a gate this central must fail loudly when it
measured nothing."""
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
    results = {}
    for name in sorted(os.listdir(out_dir)):
        qdir = f"{out_dir}/{name}"
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(f"{qdir}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files \
            else pd.DataFrame()
        if name not in oracle:
            ok = len(got) > 0
            print(f"  [rows-only] {name}: {len(got)} rows "
                  f"{'OK' if ok else 'EMPTY!'}")
            results[name] = {"status": "rows-only" if ok
                             else "fail-empty", "rows": len(got)}
            if not ok:
                n_fail += 1
            continue
        try:
            want = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"  [FAIL-oracle] {name}: {e}")
            results[name] = {"status": "fail-oracle", "rows": len(got)}
            n_fail += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"  [FAIL-schema] {name}: spark={list(g.columns)} "
                  f"duck={list(w.columns)}")
            results[name] = {"status": "fail-schema", "rows": len(g)}
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"  [FAIL-rows] {name}: spark={len(g)} duck={len(w)}")
            results[name] = {"status": "fail-rows", "rows": len(g)}
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
            results[name] = {"status": "fail-values", "rows": len(g)}
            n_fail += 1
        else:
            dt = ""
            for c in g.columns:
                if str(g[c].dtype) != str(w[c].dtype):
                    dt += f" ({c}: {g[c].dtype} vs {w[c].dtype})"
            print(f"  [PASS] {name}: {len(g)} rows{dt}")
            results[name] = {"status": "pass", "rows": len(g)}
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    art = os.path.join(repo_root, "CORRECTNESS_local.json")
    with open(art, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print(f"wrote {art} ({len(results)} entries)")
    if not results:
        print("FATAL: correctness artifact is EMPTY — the gate "
              "measured nothing (missing verify output dir?)")
        return 2
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

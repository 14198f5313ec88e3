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
{name: {"status": "pass"|"fail-..."|"rows-only", "rows": N,
"oracle_s": seconds}}) next to this script's repo root, and exits
NON-ZERO if the artifact would be empty — round 12's driver artifact
was a 2-byte `{}` and nothing repo-side noticed; a gate this central
must fail loudly when it measured nothing.

r14: per-query ORACLE TIMING (oracle_s in the artifact, the slowest
ten echoed at the end — the knob that keeps the gate's DuckDB tail
observable as the catalog grows) and a THREAD-POOL gate: each worker
gets its own DuckDB connection over the same read-only parquet views,
so the handful of minute-class unrolled-fit oracles overlap instead
of serializing the whole 200-entry run."""
import sys, json, glob, os, time
import concurrent.futures as cf
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

WORKERS = min(8, os.cpu_count() or 1)

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)

def connect(sf_dir):
    con = duckdb.connect()
    # each connection defaults to ~80% of physical RAM; WORKERS of
    # them running minute-class unrolled-fit oracles concurrently can
    # overcommit the gate host (r14 advice) — bound the aggregate
    try:
        ram_gb = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES") / 2**30
        con.execute(f"SET memory_limit='{max(1, int(ram_gb * 0.8 / WORKERS))}GB'")
    except (ValueError, OSError):
        pass  # non-POSIX host: keep DuckDB's default
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con

def check_one(sf_dir, out_dir, name, oracle):
    """Gate one query; returns (name, line, result-dict)."""
    qdir = f"{out_dir}/{name}"
    files = glob.glob(f"{qdir}/*.parquet")
    got = pd.concat([pd.read_parquet(f) for f in files]) if files \
        else pd.DataFrame()
    if name not in oracle:
        ok = len(got) > 0
        return (name,
                f"  [rows-only] {name}: {len(got)} rows "
                f"{'OK' if ok else 'EMPTY!'}",
                {"status": "rows-only" if ok else "fail-empty",
                 "rows": len(got)})
    con = connect(sf_dir)
    t0 = time.time()
    try:
        want = con.execute(oracle[name]).df()
    except Exception as e:
        return (name, f"  [FAIL-oracle] {name}: {e}",
                {"status": "fail-oracle", "rows": len(got)})
    finally:
        dt_oracle = round(time.time() - t0, 1)
        con.close()
    g, w = canon(got), canon(want)
    res = {"rows": len(g), "oracle_s": dt_oracle}
    if list(g.columns) != list(w.columns):
        return (name,
                f"  [FAIL-schema] {name}: spark={list(g.columns)} "
                f"duck={list(w.columns)}", dict(res, status="fail-schema"))
    if len(g) != len(w):
        return (name, f"  [FAIL-rows] {name}: spark={len(g)} duck={len(w)}",
                dict(res, status="fail-rows"))
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
        return (name, f"  [FAIL-values] {name}: {'; '.join(mismatch[:3])}",
                dict(res, status="fail-values"))
    dt = ""
    for c in g.columns:
        if str(g[c].dtype) != str(w[c].dtype):
            dt += f" ({c}: {g[c].dtype} vs {w[c].dtype})"
    return (name, f"  [PASS] {name}: {len(g)} rows ({dt_oracle}s){dt}",
            dict(res, status="pass"))

def main(sf_dir, out_dir):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(n for n in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{n}"))
    t0 = time.time()
    results = {}
    with cf.ThreadPoolExecutor(max_workers=WORKERS) as ex:
        futs = {ex.submit(check_one, sf_dir, out_dir, n, oracle): n
                for n in names}
        done = {}
        for fut in cf.as_completed(futs):
            try:
                name, line, res = fut.result()
            except Exception as e:  # a crashed worker is a gate failure
                name = futs[fut]
                line, res = (f"  [FAIL-gate] {name}: {e}",
                             {"status": "fail-gate", "rows": 0})
            done[name] = (line, res)
    for n in names:  # report in stable name order, not finish order
        line, res = done[n]
        print(line)
        results[n] = res
    n_pass = sum(r["status"] == "pass" for r in results.values())
    n_fail = sum(r["status"].startswith("fail") for r in results.values())
    print(f"== {n_pass} pass / {n_fail} fail == "
          f"({round(time.time() - t0, 1)}s wall, {WORKERS} workers)")
    slow = sorted(((r.get("oracle_s", 0), n) for n, r in results.items()),
                  reverse=True)[:10]
    print("slowest oracles: " +
          ", ".join(f"{n}={s}s" for s, n in slow if s > 0))
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

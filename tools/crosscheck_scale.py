#!/usr/bin/env python3
"""Scale-sweep variant of crosscheck.py (round-6/7 lessons baked in):

- ONE DuckDB connection per query, in a SUBPROCESS: a single connection
  accumulates temp spill storage across queries (a 44 GB file held until
  close), and a runaway oracle must not take down the whole sweep.
- memory_limit + per-query temp_directory + wall-clock timeout.
- resumable: results land in a JSON state file after every query, so an
  interrupted sweep continues where it stopped.

Usage:
  crosscheck_scale.py <sfdir> <verify_outdir> <state.json>
      [--mem 40GB] [--timeout 1800] [--only q1,q2] [--rerun-fails]
  crosscheck_scale.py --single <sfdir> <outdir> <query> <mem>   (internal)
"""
import sys, json, glob, os, subprocess, time

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def compare_one(sfdir, outdir, name, mem):
    import duckdb
    import pandas as pd
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    sql = oracle[name]
    tmpdir = f"/tmp/duck_spill_{name}"
    os.makedirs(tmpdir, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{mem}'")
    con.execute(f"SET temp_directory='{tmpdir}'")
    for t in TABLES:
        path = f"{sfdir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    pq = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    if not pq:
        return {"status": "NO_SPARK_OUTPUT"}
    got = pd.concat([pd.read_parquet(p) for p in pq], ignore_index=True)
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        return {"status": "ORACLE_FAIL", "err": str(e)[:500]}
    finally:
        pass
    got, exp = got[sorted(got.columns)], exp[sorted(exp.columns)]
    if list(got.columns) != list(exp.columns):
        return {"status": "COLS", "got": list(got.columns),
                "exp": list(exp.columns)}
    if len(got) != len(exp):
        return {"status": "NROWS", "got": len(got), "exp": len(exp)}
    cols = list(got.columns)
    got = got.sort_values(cols, kind="mergesort").reset_index(drop=True)
    exp = exp.sort_values(cols, kind="mergesort").reset_index(drop=True)
    notes = []
    for c in cols:
        a, b = got[c], exp[c]
        try:
            neq = ~((a == b) | (a.isna() & b.isna()))
        except Exception:
            neq = a.astype(str) != b.astype(str)
        if neq.any():
            i = int(neq.idxmax())
            return {"status": "VALUE", "col": c, "row": i,
                    "got": repr(a[i]), "exp": repr(b[i]),
                    "n_mismatch": int(neq.sum())}
        if str(a.dtype) != str(b.dtype):
            notes.append(f"dtype {c}: {a.dtype} vs {b.dtype}")
    r = {"status": "OK", "rows": len(got)}
    if notes:
        r["notes"] = notes
    return r


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--single":
        _, _, sfdir, outdir, name, mem = sys.argv
        r = compare_one(sfdir, outdir, name, mem)
        print("RESULT_JSON:" + json.dumps(r))
        return

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sfdir, outdir, statefile = args[0], args[1], args[2]
    mem = "40GB"
    timeout = 1800
    only = None
    rerun_fails = "--rerun-fails" in sys.argv
    for i, a in enumerate(sys.argv):
        if a == "--mem":
            mem = sys.argv[i + 1]
        if a == "--timeout":
            timeout = int(sys.argv[i + 1])
        if a == "--only":
            only = set(sys.argv[i + 1].split(","))
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    state = {}
    if os.path.exists(statefile):
        state = json.load(open(statefile))
    todo = [n for n in sorted(oracle)
            if (only is None or n in only)
            and (n not in state
                 or (rerun_fails and state[n].get("status") != "OK"))]
    print(f"[sweep] {len(todo)} to check, {len(state)} already in state")
    for idx, name in enumerate(todo):
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, __file__, "--single", sfdir, outdir,
                 name, mem],
                capture_output=True, text=True, timeout=timeout)
            out = p.stdout
            marker = [l for l in out.splitlines()
                      if l.startswith("RESULT_JSON:")]
            if marker:
                r = json.loads(marker[0][len("RESULT_JSON:"):])
            else:
                r = {"status": "CRASH",
                     "err": (p.stderr or out)[-500:]}
        except subprocess.TimeoutExpired:
            r = {"status": "TIMEOUT", "timeout_s": timeout}
        r["secs"] = round(time.time() - t0, 1)
        state[name] = r
        json.dump(state, open(statefile, "w"), indent=1, sort_keys=True)
        # clean the per-query spill dir win or lose
        subprocess.run(["rm", "-rf", f"/tmp/duck_spill_{name}"])
        print(f"[{idx+1}/{len(todo)}] {name}: {r['status']} "
              f"({r['secs']}s)" + (f" {r.get('err','')[:120]}"
                                   if r['status'] != 'OK' else ""),
              flush=True)
    ok = sum(1 for v in state.values() if v["status"] == "OK")
    print(f"-- state: {ok}/{len(state)} OK")


if __name__ == "__main__":
    main()

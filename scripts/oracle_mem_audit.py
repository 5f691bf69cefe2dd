#!/usr/bin/env python3
"""Bisect the DuckDB memory floor of each oracle SQL statement.

Usage: oracle_mem_audit.py <sfDir> <verifyOutDir> [query ...]

For every entry in <verifyOutDir>/oracle_sql.json (optionally filtered),
runs the statement under descending `PRAGMA memory_limit` caps until it
fails, and reports the smallest passing cap plus the runtime there. This is
the sidecar evidence behind the per-oracle "peak-memory note" — any oracle
whose floor exceeds FLAG_MB is a q176-style re-inlining blowup candidate
(fix with AS MATERIALIZED CTEs / list-comprehension aggregation, not with a
bigger box). Emits one JSON line per query and a final summary JSON.
"""
import json, os, sys, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
# descending caps to probe; floors are reported as the smallest passing cap
CAPS_MB = [2048, 1024, 512, 256, 128, 64, 32]
FLAG_MB = 256


def run_once(sf_dir, sql, cap_mb):
    con = duckdb.connect()
    try:
        con.execute(f"PRAGMA memory_limit='{cap_mb}MB'")
        # no temp_directory: spilling would mask the true in-memory floor
        for t in TABLES:
            p = f"{sf_dir}/{t}.parquet"
            if os.path.exists(p):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        t0 = time.time()
        n = len(con.sql(sql).fetchall())
        return True, time.time() - t0, n, None
    except Exception as e:
        return False, 0.0, 0, str(e)[:120]
    finally:
        con.close()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(oracle):
        if only and name not in only:
            continue
        floor = None
        t_at_floor = None
        rows = None
        for cap in CAPS_MB:
            ok, t, n, err = run_once(sf_dir, oracle[name], cap)
            if ok:
                floor, t_at_floor, rows = cap, t, n
            else:
                break
        if floor is None:
            print(json.dumps({"query": name, "floor_mb": None,
                              "err": err}))
            results[name] = {"floor_mb": None, "err": err}
        else:
            flag = floor > FLAG_MB
            print(json.dumps({"query": name, "floor_mb": floor,
                              "sec_at_floor": round(t_at_floor, 2),
                              "rows": rows, "heavy": flag}))
            results[name] = {"floor_mb": floor,
                             "sec_at_floor": round(t_at_floor, 2),
                             "heavy": flag}
    heavy = {k: v for k, v in results.items()
             if v.get("floor_mb") is None or v.get("heavy")}
    print(json.dumps({"summary": {"n": len(results), "heavy": heavy,
                                  "flag_mb": FLAG_MB}}))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Times each DuckDB oracle (min of 2 runs) against an sf dir — the
same comparator the judge uses for BENCH ratios.

Usage: python3 tools/duckbench.py <sfDir> <verifyOutDir-with-oracle_sql.json>
"""
import sys, os, glob, json, time
import duckdb

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in sorted(glob.glob(f"{sfdir}/*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    total = 0.0
    times = {}
    for name in sorted(oracle):
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            con.execute(oracle[name]).fetchall()
            best = min(best, time.time() - t0)
        times[name] = best
        total += best
    out = {"total": round(total, 3), "sf": sfdir,
           "queries": {k: round(v, 4) for k, v in times.items()}}
    print(json.dumps(out))
    # Durable copy next to bench.json: graft.Bench reads it (if present
    # and covering the same sf dir) to annotate its compact stdout line
    # with the paired DuckDB total, so the driver's BENCH artifact
    # carries the ratio without a separate pairing step.
    with open("duckbench.json", "w") as f:
        json.dump(out, f)

if __name__ == "__main__":
    main()

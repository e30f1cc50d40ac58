#!/usr/bin/env python3
"""Times each DuckDB oracle (min of 2 runs) against an sf dir — the
same comparator the judge uses for BENCH ratios.

Usage: python3 tools/duckbench.py <sfDir> <verifyOutDir-with-oracle_sql.json>
"""
import sys, os, glob, json, time
import duckdb

def loadavg():
    """[1m, 5m, 15m] from /proc/loadavg; zeros if unreadable."""
    try:
        return [float(x) for x in open("/proc/loadavg").read().split()[:3]]
    except Exception:
        return [0.0, 0.0, 0.0]

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in sorted(glob.glob(f"{sfdir}/*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        # driver testdata ships single files; ScaleGen/TpchGen growth
        # dirs are Spark-written DIRECTORIES of part files
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    load_start = loadavg()
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
    # Host-state annotation, mirroring graft.Bench's: a spark/duck
    # ratio is only as honest as the SYMMETRY of the two sides' host
    # conditions — an r9 pairing paired a quiet-host DuckDB run against
    # a loaded-host Spark run and read 0.25x worse than the same code
    # measured symmetrically. Recording loadavg here makes that
    # asymmetry visible in the artifact instead of discoverable only by
    # rerunning.
    out = {"total": round(total, 3), "sf": sfdir,
           "loadavg_start": load_start, "loadavg_end": loadavg(),
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

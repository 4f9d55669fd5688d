#!/usr/bin/env python3
"""Time every oracle SQL in DuckDB — the engine-independent bench baseline.

The reference publishes no timings (BASELINE.md), so cross-round Spark
numbers had no absolute denominator. This runs each SparkEntry.oracleSql
(as dumped by graft.Verify into oracle_sql.json) in DuckDB over the same
parquet tables and records per-query wall seconds: a mature single-node
OLAP engine executing the semantically-identical query on identical data.

Methodology mirrors graft.Bench where it transfers: results are fully
materialized (fetchall), each query is timed twice and the MIN kept (this
host's vCPU stalls inflate single samples 10-30x; a stall never makes a
query faster), and the second pass runs in reverse order to decorrelate
stall windows. Output: one JSON object keyed by query name, plus meta.

Usage: python3 tools/bench_oracle.py <sfDir> <oracle_sql.json> [out.json]
"""
import sys, json, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, oracle_path, out_path=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(oracle_path))

    def time_one(sql):
        t0 = time.monotonic()
        try:
            con.execute(sql).fetchall()
            err = None
        except Exception as e:
            err = str(e)[:200]
        return time.monotonic() - t0, err

    names = sorted(oracle)
    pass1, errs = {}, {}
    for name in names:
        dt, err = time_one(oracle[name])
        pass1[name] = dt
        if err:
            errs[name] = err
        print(f"pass1 {name:32s} {dt:8.3f} s{'  ERR' if err else ''}", file=sys.stderr)
    result = {}
    for name in reversed(names):
        if name in errs:
            continue
        dt, err = time_one(oracle[name])
        result[name] = min(pass1[name], dt)
        print(f"pass2 {name:32s} {dt:8.3f} s", file=sys.stderr)
    out = {
        "engine": duckdb.__version__,
        "sf": sf_dir,
        "unit": "sec",
        "note": "min of 2 passes (2nd reversed); full materialization; "
                "single-threaded-unconstrained duckdb defaults",
        "total": sum(result.values()),
        "queries": {n: result[n] for n in sorted(result)},
        "errors": errs,
    }
    text = json.dumps(out, indent=1)
    if out_path:
        open(out_path, "w").write(text + "\n")
    print(text)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))

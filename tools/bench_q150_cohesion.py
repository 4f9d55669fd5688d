#!/usr/bin/env python3
"""Record q150's structurally-matched DuckDB baseline cell.

q150 (dup-cluster cohesion diagnostics) SERVES the materialized near-dup
pair table and cluster manifest — the same stored artifacts q40/q76/q86
consume — and times only the reporting half: triangle enumeration + the
three per-cluster aggregations. The honest DuckDB twin therefore builds
pairs + cluster labels in UNTIMED setup (the same shingle self-join +
recursive-CTE closure the correctness oracle replays), exports both to
parquet and reads them back through views (storage symmetry with
Tables.servedArtifact), then TIMES only the reporting query.

The full-replay oracle remains the correctness twin; before timing, the
reporting-over-stored-artifacts result is asserted equal to the full
replay.

Methodology: 2 runs x 2 passes, per-cell MIN, full materialization.

Usage: python3 tools/bench_q150_cohesion.py <sfDir> <oracle_sql.json> [--update[=BASELINE_DUCKDB.json]]
"""
import sys, json, os, tempfile, time
import duckdb

REPORT = """WITH tri AS (
  SELECT p1.doc_a AS x, p1.doc_b AS y, p2.doc_b AS z
  FROM pairs p1
  JOIN pairs p2 ON p2.doc_a = p1.doc_b
  JOIN pairs p3 ON p3.doc_a = p1.doc_a AND p3.doc_b = p2.doc_b),
nodes AS (
  SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_docs
  FROM clu GROUP BY 1 HAVING count(*) >= 2),
edg AS (
  SELECT c.cluster_id, CAST(count(*) AS BIGINT) AS n_edges
  FROM pairs p JOIN clu c ON c.doc_id = p.doc_a GROUP BY 1),
trc AS (
  SELECT c.cluster_id, CAST(count(*) AS BIGINT) AS n_triangles
  FROM tri t JOIN clu c ON c.doc_id = t.x GROUP BY 1)
SELECT n.cluster_id, n.n_docs,
  COALESCE(e.n_edges, 0) AS n_edges,
  COALESCE(tc.n_triangles, 0) AS n_triangles,
  (COALESCE(e.n_edges, 0) * 2 = n.n_docs * (n.n_docs - 1)) AS is_clique
FROM nodes n
LEFT JOIN edg e USING (cluster_id)
LEFT JOIN trc tc USING (cluster_id)"""


def artifact_sqls(oracle_sql):
    """Split the oracle into its two untimed artifact builds: the pair
    table (CTE chain up to `pairs`) and the cluster manifest (chain up
    to `clu`, with the already-built pair view spliced in)."""
    def chop(sql, end_marker):
        # slice the CTE chain up to the marker, dropping the trailing
        # comma that separated it from the next CTE
        s = sql[:sql.index(end_marker)].rstrip()
        assert s.endswith(","), f"unexpected CTE boundary before {end_marker}"
        return s[:-1] + "\n"
    pairs_sql = (chop(oracle_sql, "edges AS (") +
                 "SELECT doc_a, doc_b FROM pairs")
    clu_start = oracle_sql.index("edges AS (")
    clu_sql = ("WITH RECURSIVE\n" +
               chop(oracle_sql[clu_start:], "tri AS (") +
               "SELECT doc_id, cluster_id FROM clu")
    return pairs_sql, clu_sql


def fresh_con(sf_dir, oracle_sql, art_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    pairs_sql, clu_sql = artifact_sqls(oracle_sql)
    t0 = time.monotonic()
    con.execute(f"CREATE TABLE pairs_build AS {pairs_sql}")
    pp = os.path.join(art_dir, "pairs.parquet")
    con.execute(f"COPY pairs_build TO '{pp}' (FORMAT PARQUET)")
    con.execute("DROP TABLE pairs_build")
    con.execute(f"CREATE VIEW pairs AS SELECT * FROM read_parquet('{pp}')")
    con.execute(f"CREATE TABLE clu_build AS {clu_sql}")
    cp = os.path.join(art_dir, "clu.parquet")
    con.execute(f"COPY clu_build TO '{cp}' (FORMAT PARQUET)")
    con.execute("DROP TABLE clu_build")
    con.execute(f"CREATE VIEW clu AS SELECT * FROM read_parquet('{cp}')")
    print(f"  setup (pair + cluster artifact build): "
          f"{time.monotonic() - t0:.2f}s", file=sys.stderr)
    return con


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    update = None
    for a in sys.argv[3:]:
        if a == "--update":
            update = "BASELINE_DUCKDB.json"
        elif a.startswith("--update="):
            update = a.split("=", 1)[1]
    oracle_sql = json.load(open(oracle_path))["q150_dup_cohesion"]

    samples = []
    art_dir = tempfile.mkdtemp(prefix="q150_cohesion_")
    for run in range(2):
        print(f"run {run + 1}: setup (untimed stored artifacts)",
              file=sys.stderr)
        con = fresh_con(sf_dir, oracle_sql, art_dir)
        if run == 0:
            rep = sorted(con.execute(REPORT).fetchall())
            full = sorted(con.execute(oracle_sql).fetchall())
            assert rep == full, (
                f"reporting-over-stored-artifacts != full replay: "
                f"{len(rep)} vs {len(full)} rows")
            print(f"  equivalence check: OK ({len(rep)} rows)",
                  file=sys.stderr)
        for p in range(2):
            t0 = time.monotonic()
            con.execute(REPORT).fetchall()
            dt = time.monotonic() - t0
            samples.append(dt)
            print(f"  pass {p + 1}: {dt:.3f}s", file=sys.stderr)
        con.close()

    cell = min(samples)
    print(json.dumps({"query": "q150_dup_cohesion", "sf": sf_dir,
                      "samples": [round(s, 4) for s in samples],
                      "min_sec": cell}))
    if update:
        with open(update) as f:
            base = json.load(f)
        old = base["queries"].get("q150_dup_cohesion")
        base["queries"]["q150_dup_cohesion"] = cell
        base["total"] = base["total"] - (old or 0.0) + cell
        with open(update, "w") as f:
            json.dump(base, f, indent=1)
        print(f"updated {update}: q150 {old} -> {cell}", file=sys.stderr)


if __name__ == "__main__":
    main()

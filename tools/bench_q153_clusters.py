#!/usr/bin/env python3
"""Record q153's structurally-matched DuckDB baseline cell.

q153 (incremental dup-cluster maintenance) consumes three stored
artifacts — the old/new snapshots' near-dup pair tables and the old
cluster manifest — and times only the maintenance machinery: the pair
delta (EXCEPT both ways), the affected-cluster closure, connected
components over the delta-reachable subgraph, and the verbatim-reuse
union. Its correctness oracle replays the FULL batch recompute
(stop list + shingles + pairs + recursive closure over the whole new
snapshot), so a hash match is the batch≡incremental theorem.

The honest PERFORMANCE twin therefore builds the three artifacts in
UNTIMED setup (the same frozen-stop-list Jaccard chain + recursive-CTE
clustering), exports them to parquet and reads them back through views
(storage symmetry with Tables.servedArtifact), and the timed statement
runs only what the incremental algorithm runs. new_snap stays a VIEW —
the new-universe id scan is timed on both sides.

Before timing, the incremental result is asserted equal (sorted rows)
to the full-recompute replay. Methodology: 2 runs x 2 passes, min.

Usage: python3 tools/bench_q153_clusters.py <sfDir> <oracle_sql.json> [--update [file]]
"""
import sys, json, os, tempfile, time
import duckdb

SHINGLES = """SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM {src}),
    LATERAL (SELECT unnest(generate_series(1, len(w) - 2)) AS i)"""


def pairs_sql(src):
    return f"""WITH sh AS MATERIALIZED (
  SELECT * FROM ({SHINGLES.format(src=src)}) s
  WHERE NOT EXISTS (SELECT 1 FROM stop_sh st WHERE st.shingle = s.shingle)),
cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS m FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b FROM inter
JOIN cnt ca ON doc_a = ca.doc_id
JOIN cnt cb ON doc_b = cb.doc_id
WHERE CAST(i AS DOUBLE) / CAST(ca.m + cb.m - i AS DOUBLE) >= 0.5"""


SETUP = [
    # q145OldSnap: eval docs pinned, %17 removals, ' v1' mutations.
    """CREATE TABLE old_snap AS
       SELECT doc_id,
         CASE WHEN doc_id % 13 = 0 AND doc_id % 20 <> 0
              THEN text || ' v1' ELSE text END AS text
       FROM documents WHERE doc_id % 17 <> 0 OR doc_id % 20 = 0""",
    """CREATE VIEW new_snap AS
       SELECT doc_id, text FROM documents
       WHERE doc_id % 19 <> 0 OR doc_id % 20 = 0""",
    # Frozen stop-shingle list (df > 200 on the OLD snapshot).
    f"""CREATE TABLE stop_sh AS
        SELECT shingle FROM ({SHINGLES.format(src='old_snap')})
        GROUP BY shingle HAVING count(*) > 200""",
    # Stored artifact 1+2: per-snapshot near-dup pair tables.
    f"CREATE TABLE old_pairs AS {pairs_sql('old_snap')}",
    f"CREATE TABLE new_pairs AS {pairs_sql('new_snap')}",
    # Stored artifact 3: the previous cluster manifest.
    """CREATE TABLE old_manifest AS
       WITH RECURSIVE
       edges AS (
         SELECT doc_a AS u, doc_b AS v FROM old_pairs
         UNION SELECT doc_b, doc_a FROM old_pairs),
       reach AS (
         SELECT u, v FROM edges
         UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
           WHERE e.v <> r.u),
       labels AS (SELECT u, min(v) AS mv FROM reach GROUP BY u)
       SELECT d.doc_id,
         CAST(LEAST(d.doc_id, COALESCE(l.mv, d.doc_id)) AS BIGINT) AS cluster_id
       FROM old_snap d LEFT JOIN labels l ON d.doc_id = l.u""",
]

INCREMENTAL = """WITH RECURSIVE
delta AS (
  (SELECT doc_a, doc_b FROM old_pairs EXCEPT SELECT doc_a, doc_b FROM new_pairs)
  UNION
  (SELECT doc_a, doc_b FROM new_pairs EXCEPT SELECT doc_a, doc_b FROM old_pairs)),
touched AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_a AS doc_id FROM delta UNION ALL SELECT doc_b FROM delta)),
new_ids AS MATERIALIZED (SELECT doc_id FROM new_snap),
affected_reps AS MATERIALIZED (
  SELECT DISTINCT cluster_id FROM old_manifest m
  WHERE EXISTS (SELECT 1 FROM touched t WHERE t.doc_id = m.doc_id)),
affected_old AS (
  SELECT doc_id FROM old_manifest m
  WHERE EXISTS (SELECT 1 FROM affected_reps r
                WHERE r.cluster_id = m.cluster_id)),
new_docs AS (
  SELECT doc_id FROM new_ids n
  WHERE NOT EXISTS (SELECT 1 FROM old_manifest m WHERE m.doc_id = n.doc_id)),
cc_universe AS MATERIALIZED (
  SELECT a.doc_id FROM affected_old a
  WHERE EXISTS (SELECT 1 FROM new_ids n WHERE n.doc_id = a.doc_id)
  UNION ALL SELECT doc_id FROM new_docs),
cc_pairs AS MATERIALIZED (
  SELECT p.doc_a, p.doc_b FROM new_pairs p
  WHERE EXISTS (SELECT 1 FROM cc_universe u WHERE u.doc_id = p.doc_a)),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM cc_pairs
  UNION SELECT doc_b, doc_a FROM cc_pairs),
reach AS (
  SELECT u, v FROM edges
  UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    WHERE e.v <> r.u),
labels AS (SELECT u, min(v) AS mv FROM reach GROUP BY u),
recomputed AS (
  SELECT u.doc_id,
    CAST(LEAST(u.doc_id, COALESCE(l.mv, u.doc_id)) AS BIGINT) AS cluster_id
  FROM cc_universe u LEFT JOIN labels l ON u.doc_id = l.u),
reused AS (
  SELECT m.doc_id, m.cluster_id FROM old_manifest m
  WHERE NOT EXISTS (SELECT 1 FROM affected_reps r
                    WHERE r.cluster_id = m.cluster_id)
    AND EXISTS (SELECT 1 FROM new_ids n WHERE n.doc_id = m.doc_id))
SELECT doc_id, cluster_id FROM reused
UNION ALL SELECT doc_id, cluster_id FROM recomputed"""

ARTIFACTS = ["old_pairs", "new_pairs", "old_manifest"]


def fresh_con(sf_dir, art_dir):
    con = duckdb.connect()
    p = os.path.join(sf_dir, "documents.parquet")
    if os.path.isdir(p):  # Spark-written dir of part files
        p = os.path.join(p, "*.parquet")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}')")
    for i, ddl in enumerate(SETUP):
        t0 = time.monotonic()
        con.execute(ddl)
        print(f"  setup {i + 1}/{len(SETUP)}: "
              f"{time.monotonic() - t0:.2f}s", file=sys.stderr)
    for a in ARTIFACTS:
        p = os.path.join(art_dir, f"{a}.parquet")
        con.execute(f"COPY {a} TO '{p}' (FORMAT PARQUET)")
        con.execute(f"DROP TABLE {a}")
        con.execute(f"CREATE VIEW {a} AS SELECT * FROM read_parquet('{p}')")
    return con


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    update = None
    if "--update" in sys.argv:
        update = "BASELINE_DUCKDB.json"
    for a in sys.argv[3:]:
        if a.startswith("--update="):
            update = a.split("=", 1)[1]
    full_sql = json.load(open(oracle_path))["q153_incremental_clusters"]

    samples = []
    art_dir = tempfile.mkdtemp(prefix="q153_artifacts_")
    for run in range(2):
        print(f"run {run + 1}: setup (untimed stored artifacts)",
              file=sys.stderr)
        con = fresh_con(sf_dir, art_dir)
        if run == 0:
            inc = sorted(con.execute(INCREMENTAL).fetchall())
            full = sorted(con.execute(full_sql).fetchall())
            assert inc == full, (
                f"incremental != full recompute: {len(inc)} vs {len(full)}")
            print(f"  equivalence check: OK ({len(inc)} rows)",
                  file=sys.stderr)
        for p in range(2):
            t0 = time.monotonic()
            con.execute(INCREMENTAL).fetchall()
            dt = time.monotonic() - t0
            samples.append(dt)
            print(f"  pass {p + 1}: {dt:.3f}s", file=sys.stderr)
        con.close()

    cell = min(samples)
    print(json.dumps({"query": "q153_incremental_clusters", "sf": sf_dir,
                      "samples": [round(s, 4) for s in samples],
                      "min_sec": cell}))
    if update:
        with open(update) as f:
            base = json.load(f)
        old = base["queries"].get("q153_incremental_clusters")
        base["queries"]["q153_incremental_clusters"] = cell
        base["total"] = base["total"] - (old or 0) + cell
        with open(update, "w") as f:
            json.dump(base, f, indent=1)
        print(f"updated {update}: q153 {old} -> {cell}", file=sys.stderr)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Record q174's structurally-matched DuckDB baseline cell.

q174 (incremental SemDeDup survivor-manifest maintenance) consumes three
stored artifacts — the quantized points, the frozen occupancy-16
centroids, and the previous snapshot's assignment + manifest — and times
only the maintenance machinery: delta-only nearest-centroid assignment
of the ADDED ids, the affected-cluster closure (added ∪ removed ids'
clusters), cluster-sharded cosine dominance recomputed over affected
clusters' surviving members, and verbatim reuse of every other manifest
row. Its correctness oracle replays the FULL recompute (training +
assignment + dominance over the whole new snapshot).

Storage symmetry with Tables.servedArtifact: artifacts are built in
UNTIMED setup (including the two-Lloyd-iteration training), exported to
parquet and read back through views; raw embeddings stay a live view.
Before timing, the incremental result is asserted equal (sorted rows) to
the full-recompute replay. Methodology: 2 runs x 2 passes, min.

Usage: python3 tools/bench_q174_semdedup.py <sfDir> <oracle_sql.json> [--update[=file]]
"""
import sys, json, os, tempfile, time
import duckdb

SQDIST = ("list_sum(list_transform(list_zip(p.qv, c.cv), "
          "z -> (z[1]-z[2])*(z[1]-z[2])))")

LLOYD_ASSIGN = f"""SELECT id, qv, cluster_id FROM (
    SELECT p.id, p.qv, c.cluster_id,
      row_number() OVER (PARTITION BY p.id ORDER BY {SQDIST},
        c.cluster_id) AS rn
    FROM pts_old p CROSS JOIN {{cents}} c)
  WHERE rn = 1"""

LLOYD_UPDATE = """SELECT cluster_id, list(cv1 ORDER BY pos) AS cv FROM (
    SELECT cluster_id, pos,
      CAST(floor(CAST(sum(v) AS DOUBLE) / CAST(count(*) AS DOUBLE)) AS BIGINT) AS cv1
    FROM (SELECT cluster_id, generate_subscripts(qv, 1) AS pos,
            unnest(qv) AS v FROM {assign})
    GROUP BY cluster_id, pos)
  GROUP BY cluster_id"""

SETUP = [
    """CREATE TABLE pts AS
       SELECT vec_id AS id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS qv
       FROM embeddings""",
    "CREATE VIEW pts_old AS SELECT * FROM pts WHERE id % 97 <> 0",
    """CREATE TABLE c0 AS
       SELECT id AS cluster_id, qv AS cv FROM (
         SELECT id, qv, row_number() OVER (ORDER BY id) AS rn FROM pts_old)
       WHERE rn <= (SELECT (count(*) + 15) // 16 FROM pts_old)""",
    f"CREATE TABLE a1 AS {LLOYD_ASSIGN.format(cents='c0')}",
    f"CREATE TABLE c1 AS {LLOYD_UPDATE.format(assign='a1')}",
    f"CREATE TABLE a2 AS {LLOYD_ASSIGN.format(cents='c1')}",
    f"CREATE TABLE cents AS {LLOYD_UPDATE.format(assign='a2')}",
    f"""CREATE TABLE prev_lists AS
        SELECT id, cluster_id FROM (
          SELECT p.id, c.cluster_id,
            row_number() OVER (PARTITION BY p.id ORDER BY {SQDIST},
              c.cluster_id) AS rn
          FROM pts_old p CROSS JOIN cents c)
        WHERE rn = 1""",
    """CREATE TABLE prev_manifest AS
       WITH e AS (
         SELECT vec_id, embedding::DOUBLE[] AS v,
           sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
         FROM embeddings WHERE vec_id % 97 <> 0),
       dom AS (
         SELECT DISTINCT b.id AS id
         FROM prev_lists a JOIN prev_lists b
           ON a.cluster_id = b.cluster_id AND a.id < b.id
         JOIN e x ON a.id = x.vec_id
         JOIN e y ON b.id = y.vec_id
         WHERE list_dot_product(x.v, y.v) / (x.nrm * y.nrm) >= 0.45)
       SELECT l.id AS vec_id, l.cluster_id, (dom.id IS NULL) AS kept
       FROM prev_lists l LEFT JOIN dom ON l.id = dom.id""",
]

INCREMENTAL = f"""WITH pts_new AS MATERIALIZED (
  SELECT * FROM pts WHERE id % 101 <> 0),
added AS MATERIALIZED (
  SELECT id, cluster_id FROM (
    SELECT p.id, c.cluster_id,
      row_number() OVER (PARTITION BY p.id ORDER BY {SQDIST},
        c.cluster_id) AS rn
    FROM (SELECT * FROM pts_new
          WHERE id NOT IN (SELECT id FROM prev_lists)) p
    CROSS JOIN cents c)
  WHERE rn = 1),
affected AS MATERIALIZED (
  SELECT DISTINCT cluster_id FROM (
    SELECT cluster_id FROM added
    UNION ALL
    SELECT cluster_id FROM prev_lists
    WHERE id NOT IN (SELECT id FROM pts_new))),
members AS MATERIALIZED (
  SELECT id, cluster_id FROM prev_lists
  WHERE id IN (SELECT id FROM pts_new)
    AND cluster_id IN (SELECT cluster_id FROM affected)
  UNION ALL
  SELECT id, cluster_id FROM added),
e AS MATERIALIZED (
  SELECT vec_id, embedding::DOUBLE[] AS v,
    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings
  WHERE vec_id % 101 <> 0
    AND vec_id IN (SELECT id FROM members)),
dom AS (
  SELECT DISTINCT b.id AS id
  FROM members a JOIN members b
    ON a.cluster_id = b.cluster_id AND a.id < b.id
  JOIN e x ON a.id = x.vec_id
  JOIN e y ON b.id = y.vec_id
  WHERE list_dot_product(x.v, y.v) / (x.nrm * y.nrm) >= 0.45)
SELECT vec_id, cluster_id, kept FROM prev_manifest
WHERE cluster_id NOT IN (SELECT cluster_id FROM affected)
  AND vec_id IN (SELECT id FROM pts_new)
UNION ALL
SELECT m.id AS vec_id, m.cluster_id, (dom.id IS NULL) AS kept
FROM members m LEFT JOIN dom ON m.id = dom.id"""

ARTIFACTS = ["pts", "cents", "prev_lists", "prev_manifest"]


def fresh_con(sf_dir, art_dir):
    con = duckdb.connect()
    p = os.path.join(sf_dir, "embeddings.parquet")
    if os.path.isdir(p):
        p = os.path.join(p, "*.parquet")
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{p}')")
    for i, ddl in enumerate(SETUP):
        t0 = time.monotonic()
        con.execute(ddl)
        print(f"  setup {i + 1}/{len(SETUP)}: "
              f"{time.monotonic() - t0:.2f}s", file=sys.stderr)
    for t in ["a1", "a2", "c0", "c1"]:
        con.execute(f"DROP TABLE {t}")
    con.execute("DROP VIEW pts_old")
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
    full_sql = json.load(open(oracle_path))["q174_incremental_semdedup"]

    samples = []
    art_dir = tempfile.mkdtemp(prefix="q174_artifacts_")
    for run in range(2):
        print(f"run {run + 1}: setup (untimed stored artifacts + training)",
              file=sys.stderr)
        con = fresh_con(sf_dir, art_dir)
        if run == 0:
            inc = sorted(map(repr, con.execute(INCREMENTAL).fetchall()))
            full = sorted(map(repr, con.execute(full_sql).fetchall()))
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
    print(json.dumps({"query": "q174_incremental_semdedup", "sf": sf_dir,
                      "samples": [round(s, 4) for s in samples],
                      "min_sec": cell}))
    if update:
        with open(update) as f:
            base = json.load(f)
        old = base["queries"].get("q174_incremental_semdedup")
        base["queries"]["q174_incremental_semdedup"] = cell
        base["total"] = base["total"] - (old or 0) + cell
        with open(update, "w") as f:
            json.dump(base, f, indent=1)
        print(f"updated {update}: q174 {old} -> {cell}", file=sys.stderr)


if __name__ == "__main__":
    main()

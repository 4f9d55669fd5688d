#!/usr/bin/env python3
"""Record q159's structurally-matched DuckDB baseline cell.

q159 (incremental IVF maintenance + stored-list serving) consumes three
stored artifacts — the quantized points, the frozen trained centroids,
and the previous snapshot's inverted-list assignment — and times only
the maintenance + serving machinery: the presence semi/anti joins, the
delta-only assignment against the 8 broadcast centroids, probe ranking
for the QUERY vectors only, the candidate join against the maintained
lists, and exact-distance top-5. Its correctness oracle replays the
FULL recompute (training + assign-all + search).

The honest twin builds the three artifacts in UNTIMED setup (the q103
training replay), exports them to parquet views (storage symmetry with
Tables.servedArtifact), then times the same incremental statement.

Before timing, the incremental result is asserted equal (sorted rows)
to the full-recompute replay. Methodology: 2 runs x 2 passes, min.

Usage: python3 tools/bench_q159_ivf.py <sfDir> <oracle_sql.json> [--update [file]]
"""
import sys, json, os, tempfile, time
import duckdb

SQDIST = ("list_sum(list_transform(list_zip({a}, {b}),"
          " z -> (z[1]-z[2])*(z[1]-z[2])))")

TRAIN_ASSIGN = """SELECT id, qv, cluster_id FROM (
    SELECT p.id, p.qv, c.cluster_id,
      row_number() OVER (PARTITION BY p.id ORDER BY
        {d}, c.cluster_id) AS rn
    FROM qpoints p CROSS JOIN {cents} c)
  WHERE rn = 1""".format(d=SQDIST.format(a="p.qv", b="c.cv"), cents="{cents}")

UPDATE = """SELECT cluster_id, list(cv1 ORDER BY pos) AS cv FROM (
    SELECT cluster_id, pos,
      CAST(floor(CAST(sum(v) AS DOUBLE) / CAST(count(*) AS DOUBLE)) AS BIGINT) AS cv1
    FROM (SELECT cluster_id, generate_subscripts(qv, 1) AS pos, unnest(qv) AS v
          FROM {assigned})
    GROUP BY cluster_id, pos)
  GROUP BY cluster_id"""

SETUP = [
    # Stored artifact 1: the quantized point table.
    """CREATE TABLE qpoints AS
       SELECT vec_id AS id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS qv
       FROM embeddings""",
    # Stored artifact 2: the frozen trained centroids (q103's replay).
    "CREATE TABLE c0 AS SELECT id AS cluster_id, qv AS cv FROM qpoints ORDER BY id LIMIT 8",
    f"CREATE TABLE a1 AS {TRAIN_ASSIGN.format(cents='c0')}",
    f"CREATE TABLE c1 AS {UPDATE.format(assigned='a1')}",
    f"CREATE TABLE a2 AS {TRAIN_ASSIGN.format(cents='c1')}",
    f"CREATE TABLE centroids AS {UPDATE.format(assigned='a2')}",
    # Stored artifact 3: the previous snapshot's inverted lists.
    f"""CREATE TABLE prev_lists AS
        SELECT id, cluster_id FROM (
          SELECT p.id, c.cluster_id,
            row_number() OVER (PARTITION BY p.id ORDER BY
              {SQDIST.format(a='p.qv', b='c.cv')}, c.cluster_id) AS rn
          FROM qpoints p CROSS JOIN centroids c
          WHERE p.id % 17 <> 0)
        WHERE rn = 1""",
]

INCREMENTAL = f"""WITH pts AS (
  SELECT * FROM qpoints WHERE id % 19 <> 0),
reused AS (
  SELECT l.id, l.cluster_id FROM prev_lists l
  WHERE EXISTS (SELECT 1 FROM pts p WHERE p.id = l.id)),
fresh AS (
  SELECT id, cluster_id FROM (
    SELECT p.id, c.cluster_id,
      row_number() OVER (PARTITION BY p.id ORDER BY
        {SQDIST.format(a='p.qv', b='c.cv')}, c.cluster_id) AS rn
    FROM pts p CROSS JOIN centroids c
    WHERE NOT EXISTS (SELECT 1 FROM prev_lists l WHERE l.id = p.id))
  WHERE rn = 1),
lists AS (SELECT id AS cand_id, cluster_id FROM reused
          UNION ALL SELECT id, cluster_id FROM fresh),
probes AS (
  SELECT id AS query_id, cluster_id FROM (
    SELECT p.id, c.cluster_id,
      row_number() OVER (PARTITION BY p.id ORDER BY
        {SQDIST.format(a='p.qv', b='c.cv')}, c.cluster_id) AS rn
    FROM pts p CROSS JOIN centroids c
    WHERE p.id % 50 = 0 AND p.id < 10000000)
  WHERE rn <= 2),
cand AS (
  SELECT DISTINCT query_id, cand_id
  FROM probes JOIN lists USING (cluster_id)
  WHERE query_id != cand_id),
scored AS (
  SELECT query_id, cand_id,
    {SQDIST.format(a='a.qv', b='b.qv')} AS dist
  FROM cand
  JOIN pts a ON query_id = a.id
  JOIN pts b ON cand_id = b.id)
SELECT query_id, cand_id, CAST(dist AS BIGINT) AS dist, rank FROM (
  SELECT query_id, cand_id, dist,
    CAST(row_number() OVER (PARTITION BY query_id
      ORDER BY dist, cand_id) AS INT) AS rank
  FROM scored)
WHERE rank <= 5"""

ARTIFACTS = ["qpoints", "centroids", "prev_lists"]


def fresh_con(sf_dir, art_dir):
    con = duckdb.connect()
    p = os.path.join(sf_dir, "embeddings.parquet")
    if os.path.isdir(p):
        p = os.path.join(p, "*.parquet")
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{p}')")
    for i, ddl in enumerate(SETUP):
        t0 = time.monotonic()
        con.execute(ddl)
        print(f"  setup {i + 1}/{len(SETUP)}: "
              f"{time.monotonic() - t0:.2f}s", file=sys.stderr)
    for t in ("a1", "a2", "c0", "c1"):
        con.execute(f"DROP TABLE {t}")
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
    full_sql = json.load(open(oracle_path))["q159_incremental_ivf"]

    samples = []
    art_dir = tempfile.mkdtemp(prefix="q159_artifacts_")
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
    print(json.dumps({"query": "q159_incremental_ivf", "sf": sf_dir,
                      "samples": [round(s, 4) for s in samples],
                      "min_sec": cell}))
    if update:
        with open(update) as f:
            base = json.load(f)
        old = base["queries"].get("q159_incremental_ivf")
        base["queries"]["q159_incremental_ivf"] = cell
        base["total"] = base["total"] - (old or 0) + cell
        with open(update, "w") as f:
            json.dump(base, f, indent=1)
        print(f"updated {update}: q159 {old} -> {cell}", file=sys.stderr)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Record q179's STORAGE-SYMMETRIC DuckDB baseline cell (ADVICE r17 #1).

Round 17 retired q179 from the weak list by serving the timed cell from
stored PQ-code/IVF-list artifacts, but its DuckDB baseline cell still
timed the FULL lists+codes+serving recompute — the comparison stopped
being like-for-like. This script restores storage symmetry the way the
q145/q148/q153 family does: the five stored artifacts (quantized
points, frozen coarse centroids, PQ codebooks, PQ codes, inverted
lists — exactly what Spark's Tables.servedArtifact cell reads) are
built in UNTIMED setup and exported to parquet views; the timed
statement is the SERVE only — query-side probe ranking, stored-list
candidate join, ADC against the stored codes, shortlist, exact re-rank.

Before timing, the serve-only result is asserted equal (sorted rows) to
the full-recompute oracle replay. Methodology: 2 runs x 2 passes, min.

Usage: python3 tools/bench_q179_stored.py <sfDir> <oracle_sql.json> [--update[=file]]
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

CODE_ASSIGN = """SELECT id, g, code_id FROM (
    SELECT s.id, s.g, b.code_id,
      row_number() OVER (PARTITION BY s.id, s.g ORDER BY
        {d}, b.code_id) AS rn
    FROM subs s JOIN {books} b ON s.g = b.g)
  WHERE rn = 1""".format(d=SQDIST.format(a="s.sub", b="b.cw"), books="{books}")

CODE_UPDATE = """SELECT g, code_id, list(cv1 ORDER BY pos) AS cw FROM (
    SELECT g, code_id, pos,
      CAST(floor(CAST(sum(v) AS DOUBLE) / CAST(count(*) AS DOUBLE)) AS BIGINT) AS cv1
    FROM (
      SELECT a.g, a.code_id, generate_subscripts(s.sub, 1) AS pos,
        unnest(s.sub) AS v
      FROM {assigned} a JOIN subs s ON a.id = s.id AND a.g = s.g)
    GROUP BY g, code_id, pos)
  GROUP BY g, code_id"""

SETUP = [
    # Stored artifact 1: the quantized point table.
    """CREATE TABLE qpoints AS
       SELECT vec_id AS id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS qv
       FROM embeddings""",
    # Stored artifact 2: the frozen coarse centroids (2 Lloyd rounds).
    "CREATE TABLE c0 AS SELECT id AS cluster_id, qv AS cv FROM qpoints ORDER BY id LIMIT 8",
    f"CREATE TABLE a1 AS {TRAIN_ASSIGN.format(cents='c0')}",
    f"CREATE TABLE c1 AS {UPDATE.format(assigned='a1')}",
    f"CREATE TABLE a2 AS {TRAIN_ASSIGN.format(cents='c1')}",
    f"CREATE TABLE centroids AS {UPDATE.format(assigned='a2')}",
    # Stored artifact 3: the trained PQ codebooks (m=4, 2 Lloyd rounds
    # per subspace, smallest-id seeding — the q116 replay).
    """CREATE TABLE subs AS
       SELECT id, g, qv[(g*s+1):(g*s+s)] AS sub
       FROM (SELECT id, qv, len(qv)//4 AS s FROM qpoints WHERE len(qv) % 4 = 0),
            (SELECT unnest(generate_series(0, 3)) AS g)""",
    """CREATE TABLE b0 AS
       SELECT g, s.id AS code_id, sub AS cw
       FROM subs s JOIN (SELECT id FROM qpoints ORDER BY id LIMIT 8) seeds
         USING (id)""",
    f"CREATE TABLE qa1 AS {CODE_ASSIGN.format(books='b0')}",
    f"CREATE TABLE b1 AS {CODE_UPDATE.format(assigned='qa1')}",
    f"CREATE TABLE qa2 AS {CODE_ASSIGN.format(books='b1')}",
    f"CREATE TABLE books AS {CODE_UPDATE.format(assigned='qa2')}",
    # Stored artifact 4: the maintained PQ codes (new snapshot encodes
    # against the frozen books — id universe matches qpoints; the
    # serve's candidate join restricts to the lists' snapshot anyway).
    f"CREATE TABLE codes AS {CODE_ASSIGN.format(books='books')}",
    # Stored artifact 5: the maintained inverted lists (new snapshot).
    f"""CREATE TABLE lists AS
        SELECT id AS cand_id, cluster_id FROM (
          SELECT p.id, c.cluster_id,
            row_number() OVER (PARTITION BY p.id ORDER BY
              {SQDIST.format(a='p.qv', b='c.cv')}, c.cluster_id) AS rn
          FROM qpoints p CROSS JOIN centroids c
          WHERE p.id % 19 <> 0)
        WHERE rn = 1""",
]

# The SERVE — exactly the machinery Spark's timed q179 cell runs over
# its stored artifacts: query-only probe ranking, stored-list candidate
# join, ADC against stored codes via the query distance table,
# oversampled shortlist, exact re-rank.
SERVE = f"""WITH probes AS (
  SELECT id AS query_id, cluster_id FROM (
    SELECT p.id, c.cluster_id,
      row_number() OVER (PARTITION BY p.id ORDER BY
        {SQDIST.format(a='p.qv', b='c.cv')}, c.cluster_id) AS rn
    FROM qpoints p CROSS JOIN centroids c
    WHERE p.id % 50 = 0 AND p.id < 10000000 AND p.id % 19 <> 0)
  WHERE rn <= 2),
cand AS (
  SELECT DISTINCT query_id, cand_id
  FROM probes JOIN lists USING (cluster_id)
  WHERE query_id != cand_id),
qsubs AS (
  SELECT id, g, qv[(g*s+1):(g*s+s)] AS sub
  FROM (SELECT id, qv, len(qv)//4 AS s FROM qpoints
        WHERE len(qv) % 4 = 0 AND id % 50 = 0 AND id < 10000000
          AND id % 19 <> 0),
       (SELECT unnest(generate_series(0, 3)) AS g)),
dtab AS (
  SELECT s.id AS query_id, s.g, b.code_id,
    {SQDIST.format(a='s.sub', b='b.cw')} AS d
  FROM qsubs s JOIN books b ON s.g = b.g),
adc AS (
  SELECT n.query_id, n.cand_id, CAST(sum(t.d) AS BIGINT) AS adc
  FROM cand n
  JOIN codes c ON c.id = n.cand_id
  JOIN dtab t ON t.query_id = n.query_id
    AND t.g = c.g AND t.code_id = c.code_id
  GROUP BY n.query_id, n.cand_id),
shortlist AS (
  SELECT query_id, cand_id FROM (
    SELECT query_id, cand_id,
      row_number() OVER (PARTITION BY query_id ORDER BY adc, cand_id) AS rn
    FROM adc)
  WHERE rn <= 320),
scored AS (
  SELECT query_id, cand_id,
    {SQDIST.format(a='a.qv', b='b.qv')} AS dist
  FROM shortlist
  JOIN qpoints a ON query_id = a.id
  JOIN qpoints b ON cand_id = b.id)
SELECT query_id, cand_id, CAST(dist AS BIGINT) AS dist, rank FROM (
  SELECT query_id, cand_id, dist,
    CAST(row_number() OVER (PARTITION BY query_id
      ORDER BY dist, cand_id) AS INT) AS rank
  FROM scored)
WHERE rank <= 5"""

ARTIFACTS = ["qpoints", "centroids", "books", "codes", "lists"]


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
    for t in ("a1", "a2", "c0", "c1", "b0", "b1", "qa1", "qa2", "subs"):
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
    full_sql = json.load(open(oracle_path))["q179_incremental_ivfpq"]

    samples = []
    art_dir = tempfile.mkdtemp(prefix="q179_artifacts_")
    for run in range(2):
        print(f"run {run + 1}: setup (untimed stored artifacts)",
              file=sys.stderr)
        con = fresh_con(sf_dir, art_dir)
        if run == 0:
            served = sorted(con.execute(SERVE).fetchall())
            full = sorted(con.execute(full_sql).fetchall())
            assert served == full, (
                f"serve-only != full recompute: {len(served)} vs {len(full)}")
            print(f"  equivalence check: OK ({len(served)} rows)",
                  file=sys.stderr)
        for p in range(2):
            t0 = time.monotonic()
            con.execute(SERVE).fetchall()
            dt = time.monotonic() - t0
            samples.append(dt)
            print(f"  pass {p + 1}: {dt:.3f}s", file=sys.stderr)
        con.close()

    cell = min(samples)
    print(json.dumps({"query": "q179_incremental_ivfpq", "sf": sf_dir,
                      "samples": [round(s, 4) for s in samples],
                      "min_sec": cell}))
    if update:
        with open(update) as f:
            base = json.load(f)
        old = base["queries"].get("q179_incremental_ivfpq")
        base["queries"]["q179_incremental_ivfpq"] = cell
        base["total"] = base["total"] - (old or 0) + cell
        with open(update, "w") as f:
            json.dump(base, f, indent=1)
        print(f"updated {update}: q179 {old} -> {cell}", file=sys.stderr)


if __name__ == "__main__":
    main()

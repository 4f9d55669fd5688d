#!/usr/bin/env python3
"""Record q160's structurally-matched DuckDB baseline cell.

q160 (incremental DSIR model maintenance) consumes three stored
artifacts — the previous snapshot's fingerprints and its two bucket
models — and times only the maintenance machinery: one hash pass over
the new snapshot, the full-outer delta diff, hashed-feature extraction
for the removed/changed (old text) and added/changed (new text) doc
sets per split, and the single-shuffle union-sum combine per model.
Its correctness oracle replays the FULL retrain of both models.

Artifacts are built in UNTIMED setup and served through parquet views
(storage symmetry with Tables.servedArtifact); both snapshots stay
live views on both sides. Before timing, the incremental result is
asserted equal (sorted rows) to the full-retrain replay.
Methodology: 2 runs x 2 passes, min.

Usage: python3 tools/bench_q160_dsir.py <sfDir> <oracle_sql.json> [--update [file]]
"""
import sys, json, os, tempfile, time
import duckdb

HASH = "md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))"

FEATS = r"""SELECT doc_id, substr(md5(f), 1, 3) AS bucket FROM (
    SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS f
    FROM {src}
    UNION ALL
    SELECT doc_id, w[i] || ' ' || w[i+1] AS f
    FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
          FROM {src}),
      LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i))
  WHERE length(trim(f)) > 0"""

SETUP = [
    """CREATE VIEW old_snap AS
       SELECT doc_id,
         CASE WHEN doc_id % 13 = 0 AND doc_id % 20 <> 0
              THEN text || ' v1' ELSE text END AS text
       FROM documents WHERE doc_id % 17 <> 0 OR doc_id % 20 = 0""",
    """CREATE VIEW new_snap AS
       SELECT doc_id, text FROM documents
       WHERE doc_id % 19 <> 0 OR doc_id % 20 = 0""",
    f"""CREATE TABLE prev_hashes AS
        SELECT doc_id, {HASH} AS content_hash FROM old_snap""",
    f"""CREATE TABLE prev_target AS
        SELECT bucket, CAST(count(*) AS BIGINT) AS cnt
        FROM ({FEATS.format(src="(SELECT * FROM old_snap WHERE doc_id % 20 = 0)")})
        GROUP BY bucket""",
    f"""CREATE TABLE prev_raw AS
        SELECT bucket, CAST(count(*) AS BIGINT) AS cnt
        FROM ({FEATS.format(src="(SELECT * FROM old_snap WHERE doc_id % 20 <> 0)")})
        GROUP BY bucket""",
]


def side_sql(tag, pred):
    old_leg = f"""(SELECT s.* FROM old_snap s
      SEMI JOIN (SELECT doc_id FROM delta
                 WHERE status IN ('removed', 'changed')) x
        ON s.doc_id = x.doc_id
      WHERE s.doc_id {pred})"""
    new_leg = f"""(SELECT s.* FROM new_snap s
      SEMI JOIN (SELECT doc_id FROM delta
                 WHERE status IN ('added', 'changed')) x
        ON s.doc_id = x.doc_id
      WHERE s.doc_id {pred})"""
    return f"""SELECT '{tag}' AS model, bucket, CAST(sum(d) AS BIGINT) AS cnt
  FROM (
    SELECT bucket, cnt AS d FROM prev_{tag}
    UNION ALL SELECT bucket, -1 FROM ({FEATS.format(src=old_leg)})
    UNION ALL SELECT bucket, 1 FROM ({FEATS.format(src=new_leg)}))
  GROUP BY bucket HAVING sum(d) > 0"""


INCREMENTAL = f"""WITH nh AS (
  SELECT doc_id, {HASH} AS new_hash FROM new_snap),
delta AS MATERIALIZED (
  SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
    CASE WHEN o.content_hash IS NULL THEN 'added'
         WHEN n.new_hash IS NULL THEN 'removed'
         WHEN o.content_hash <> n.new_hash THEN 'changed'
         ELSE 'unchanged' END AS status
  FROM prev_hashes o FULL OUTER JOIN nh n ON o.doc_id = n.doc_id)
{side_sql('target', '% 20 = 0')}
UNION ALL
{side_sql('raw', '% 20 <> 0')}"""

ARTIFACTS = ["prev_hashes", "prev_target", "prev_raw"]


def fresh_con(sf_dir, art_dir):
    con = duckdb.connect()
    p = os.path.join(sf_dir, "documents.parquet")
    if os.path.isdir(p):
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
    full_sql = json.load(open(oracle_path))["q160_incremental_dsir"]

    samples = []
    art_dir = tempfile.mkdtemp(prefix="q160_artifacts_")
    for run in range(2):
        print(f"run {run + 1}: setup (untimed stored artifacts)",
              file=sys.stderr)
        con = fresh_con(sf_dir, art_dir)
        if run == 0:
            inc = sorted(con.execute(INCREMENTAL).fetchall())
            full = sorted(con.execute(full_sql).fetchall())
            assert inc == full, (
                f"incremental != full retrain: {len(inc)} vs {len(full)}")
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
    print(json.dumps({"query": "q160_incremental_dsir", "sf": sf_dir,
                      "samples": [round(s, 4) for s in samples],
                      "min_sec": cell}))
    if update:
        with open(update) as f:
            base = json.load(f)
        old = base["queries"].get("q160_incremental_dsir")
        base["queries"]["q160_incremental_dsir"] = cell
        base["total"] = base["total"] - (old or 0) + cell
        with open(update, "w") as f:
            json.dump(base, f, indent=1)
        print(f"updated {update}: q160 {old} -> {cell}", file=sys.stderr)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Record q148's structurally-matched DuckDB baseline cell.

q148 (incremental MinHash band-index maintenance) reuses the stored
signature index for unchanged documents and re-signs only the snapshot
delta; its correctness oracle replays the FULL index rebuild. Like
q145, the honest PERFORMANCE twin must run the same incremental
machinery: the stored artifacts (previous snapshot fingerprints,
previous MinHash index) are built in UNTIMED setup, exported to
parquet and read back through views (storage symmetry with
Tables.servedArtifact), and the timed statement runs only what the
incremental algorithm runs — one hash pass over the new snapshot, the
delta diff, the reuse semi-join, delta-only re-signing, banding with
the bucket-occupancy cap, and candidate-driven exact-Jaccard
verification.

Before timing, the incremental result is asserted equal (sorted rows)
to the full-rebuild replay. Methodology: 2 runs x 2 passes, min.

Usage: python3 tools/bench_q148_minhash.py <sfDir> <oracle_sql.json> [--update [file]]
"""
import sys, json, os, tempfile, time
import duckdb

HASH = "md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))"
MHS = ",\n    ".join(f"min(md5('{i}:' || shingle)) AS mh_{i}"
                     for i in range(16))


def bands_sql(src):
    return "\n  UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, "
        f"mh_{2 * b} || '|' || mh_{2 * b + 1} AS band_key FROM {src}"
        for b in range(8))


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
    # Stored artifact 1: previous snapshot fingerprints.
    f"""CREATE TABLE prev_hashes AS
        SELECT doc_id, {HASH} AS content_hash FROM old_snap""",
    # Stored artifact 2: previous MinHash signature index (k=16).
    f"""CREATE TABLE prev_index AS
        WITH wrds AS (
          SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
          FROM old_snap),
        sh AS (
          SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
          FROM wrds, LATERAL (SELECT unnest(generate_series(1, len(w) - 2)) AS i))
        SELECT doc_id, {MHS}, CAST(count(*) AS BIGINT) AS m
        FROM sh GROUP BY doc_id""",
]

INCREMENTAL = f"""WITH nh AS (
  SELECT doc_id, {HASH} AS new_hash FROM new_snap),
delta AS (
  SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
    CASE WHEN o.content_hash IS NULL THEN 'added'
         WHEN n.new_hash IS NULL THEN 'removed'
         WHEN o.content_hash <> n.new_hash THEN 'changed'
         ELSE 'unchanged' END AS status
  FROM prev_hashes o FULL OUTER JOIN nh n ON o.doc_id = n.doc_id),
reused AS (
  SELECT p.* FROM prev_index p
  SEMI JOIN (SELECT doc_id FROM delta WHERE status = 'unchanged') u
    ON p.doc_id = u.doc_id),
dwrds AS (
  SELECT s.doc_id, string_split_regex(trim(s.text), '\\s+') AS w
  FROM new_snap s
  SEMI JOIN (SELECT doc_id FROM delta
             WHERE status IN ('added', 'changed')) c
    ON s.doc_id = c.doc_id),
dsh AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
  FROM dwrds, LATERAL (SELECT unnest(generate_series(1, len(w) - 2)) AS i)),
resigned AS (
  SELECT doc_id, {MHS}, CAST(count(*) AS BIGINT) AS m
  FROM dsh GROUP BY doc_id),
idx AS MATERIALIZED (
  SELECT * FROM reused UNION ALL SELECT * FROM resigned),
bands AS ({bands_sql('idx')}),
bok AS (
  SELECT doc_id, band_idx, band_key FROM bands
  QUALIFY count(*) OVER (PARTITION BY band_idx, band_key) <= 64),
cand AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bok a JOIN bok b USING (band_idx, band_key)
  WHERE a.doc_id < b.doc_id),
cids AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_a AS doc_id FROM cand
    UNION ALL SELECT doc_b FROM cand)),
cwrds AS (
  SELECT s.doc_id, string_split_regex(trim(s.text), '\\s+') AS w
  FROM new_snap s SEMI JOIN cids ON s.doc_id = cids.doc_id),
csh AS MATERIALIZED (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
  FROM cwrds, LATERAL (SELECT unnest(generate_series(1, len(w) - 2)) AS i)),
inter AS (
  SELECT c.doc_a, c.doc_b, CAST(count(*) AS BIGINT) AS i
  FROM cand c
  JOIN csh a ON a.doc_id = c.doc_a
  JOIN csh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY 1, 2)
SELECT doc_a, doc_b,
  CAST(i AS DOUBLE) / CAST(ca.m + cb.m - i AS DOUBLE) AS jaccard
FROM inter
JOIN idx ca ON doc_a = ca.doc_id
JOIN idx cb ON doc_b = cb.doc_id
WHERE CAST(i AS DOUBLE) / CAST(ca.m + cb.m - i AS DOUBLE) >= 0.5"""

ARTIFACTS = ["prev_hashes", "prev_index"]


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
    full_sql = json.load(open(oracle_path))["q148_incremental_minhash"]

    samples = []
    art_dir = tempfile.mkdtemp(prefix="q148_artifacts_")
    for run in range(2):
        print(f"run {run + 1}: setup (untimed stored artifacts)",
              file=sys.stderr)
        con = fresh_con(sf_dir, art_dir)
        if run == 0:
            inc = sorted(con.execute(INCREMENTAL).fetchall())
            full = sorted(con.execute(full_sql).fetchall())
            assert inc == full, (
                f"incremental != full rebuild: {len(inc)} vs {len(full)}")
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
    print(json.dumps({"query": "q148_incremental_minhash", "sf": sf_dir,
                      "samples": [round(s, 4) for s in samples],
                      "min_sec": cell}))
    if update:
        with open(update) as f:
            base = json.load(f)
        old = base["queries"].get("q148_incremental_minhash")
        base["queries"]["q148_incremental_minhash"] = cell
        base["total"] = base["total"] - (old or 0) + cell
        with open(update, "w") as f:
            json.dump(base, f, indent=1)
        print(f"updated {update}: q148 {old} -> {cell}", file=sys.stderr)


if __name__ == "__main__":
    main()

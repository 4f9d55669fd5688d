#!/usr/bin/env python3
"""Record q171's structurally-matched DuckDB baseline cell.

q171 (incremental BM25 index maintenance + whole-query serving) consumes
two stored artifacts — the previous snapshot's fingerprints and its
postings table — and times only the maintenance-and-serve machinery: one
hash pass over the new snapshot, the full-outer delta diff, verbatim
posting reuse for unchanged docs, re-tokenization of the delta only,
df/stats re-derivation from the maintained index, the df-rank query
panel and the whole-query top-5. Its correctness oracle replays the FULL
reindex over the new snapshot.

The honest PERFORMANCE twin builds the artifacts in UNTIMED setup,
exports them to parquet and reads them back through views (storage
symmetry with Tables.servedArtifact), and times the same incremental
statement; the new snapshot stays a live VIEW (the Spark cell derives it
from the documents scan inside the timed plan too).

Before timing, the incremental result is asserted equal (sorted rows) to
the full-reindex replay. Methodology: 2 runs x 2 passes, min.

Usage: python3 tools/bench_q171_bm25.py <sfDir> <oracle_sql.json> [--update[=file]]
"""
import sys, json, os, tempfile, time
import duckdb

HASH = "md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))"

POSTINGS = r"""SELECT t AS term, doc_id, CAST(len(ws) AS BIGINT) AS dl,
    CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, ws, unnest(ws) AS t
        FROM (SELECT doc_id,
                string_split_regex(trim(lower(text)), '\s+') AS ws
              FROM {src})
        WHERE len(ws) >= 1)
  GROUP BY 1, 2, 3"""

SETUP = [
    """CREATE VIEW old_snap AS
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
    # Stored artifact 2: previous snapshot's postings table.
    f"CREATE TABLE prev_post AS {POSTINGS.format(src='old_snap')}",
]

FRESH_SRC = """(SELECT s.* FROM new_snap s
    SEMI JOIN (SELECT doc_id FROM delta
               WHERE status IN ('added', 'changed')) x
      ON s.doc_id = x.doc_id)"""

INCREMENTAL = f"""WITH nh AS (
  SELECT doc_id, {HASH} AS new_hash FROM new_snap),
delta AS MATERIALIZED (
  SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
    CASE WHEN o.content_hash IS NULL THEN 'added'
         WHEN n.new_hash IS NULL THEN 'removed'
         WHEN o.content_hash <> n.new_hash THEN 'changed'
         ELSE 'unchanged' END AS status
  FROM prev_hashes o FULL OUTER JOIN nh n ON o.doc_id = n.doc_id),
reused AS (
  SELECT p.* FROM prev_post p
  SEMI JOIN (SELECT doc_id FROM delta WHERE status = 'unchanged') u
    ON p.doc_id = u.doc_id),
fresh AS ({POSTINGS.format(src=FRESH_SRC)}),
post AS MATERIALIZED (
  SELECT * FROM reused UNION ALL SELECT * FROM fresh),
stats AS (
  SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n,
    CAST(sum(tf) AS BIGINT) // count(DISTINCT doc_id) AS avgdl
  FROM post),
dft AS MATERIALIZED (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM post GROUP BY 1),
q AS (
  SELECT CAST((rnk - 5) % 4 AS BIGINT) AS query_id, term, df
  FROM (SELECT term, df,
          row_number() OVER (ORDER BY df DESC, term) AS rnk
        FROM dft ORDER BY df DESC, term LIMIT 16)
  WHERE rnk >= 5),
scored AS (
  SELECT q.query_id, p.doc_id,
    CAST(sum(
      (1000000 * length(bin((n + 1) // (df + 1))))
        * ((22 * tf * avgdl * 1000000)
           // (10 * avgdl * tf + 3 * avgdl + 9 * dl))
        // 1000000) AS BIGINT) AS score,
    CAST(count(*) AS BIGINT) AS n_terms
  FROM post p JOIN q USING (term), stats
  GROUP BY 1, 2),
hits AS (
  SELECT query_id, CAST(rnk AS INT) AS rank, doc_id, score, n_terms
  FROM (SELECT query_id, doc_id, score, n_terms,
          row_number() OVER (PARTITION BY query_id
            ORDER BY score DESC, doc_id) AS rnk
        FROM scored)
  WHERE rnk <= 5)
SELECT 'df' AS kind, term, CAST(NULL AS BIGINT) AS query_id,
  CAST(NULL AS INT) AS rank, CAST(NULL AS BIGINT) AS doc_id,
  df AS v1, CAST(NULL AS BIGINT) AS v2
FROM dft
UNION ALL
SELECT 'stats', CAST(NULL AS VARCHAR), NULL, NULL, NULL, n, avgdl
FROM stats
UNION ALL
SELECT 'hit', CAST(NULL AS VARCHAR), query_id, rank, doc_id,
  score, n_terms
FROM hits"""

ARTIFACTS = ["prev_hashes", "prev_post"]


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
    full_sql = json.load(open(oracle_path))["q171_incremental_bm25"]

    samples = []
    art_dir = tempfile.mkdtemp(prefix="q171_artifacts_")
    for run in range(2):
        print(f"run {run + 1}: setup (untimed stored artifacts)",
              file=sys.stderr)
        con = fresh_con(sf_dir, art_dir)
        if run == 0:
            inc = sorted(map(repr, con.execute(INCREMENTAL).fetchall()))
            full = sorted(map(repr, con.execute(full_sql).fetchall()))
            assert inc == full, (
                f"incremental != full reindex: {len(inc)} vs {len(full)}")
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
    print(json.dumps({"query": "q171_incremental_bm25", "sf": sf_dir,
                      "samples": [round(s, 4) for s in samples],
                      "min_sec": cell}))
    if update:
        with open(update) as f:
            base = json.load(f)
        old = base["queries"].get("q171_incremental_bm25")
        base["queries"]["q171_incremental_bm25"] = cell
        base["total"] = base["total"] - (old or 0) + cell
        with open(update, "w") as f:
            json.dump(base, f, indent=1)
        print(f"updated {update}: q171 {old} -> {cell}", file=sys.stderr)


if __name__ == "__main__":
    main()

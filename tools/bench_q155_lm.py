#!/usr/bin/env python3
"""Record q155's structurally-matched DuckDB baseline cell.

q155 (incremental LM count-model maintenance) consumes two stored
artifacts — the previous snapshot's fingerprints and its bigram count
model — and times only the maintenance machinery: one hash pass over
the new snapshot, the full-outer delta diff, bigram extraction for the
removed/changed (old text) and added/changed (new text) doc sets, and
the three-leg union-sum combine with zero-count rows dropped. Its
correctness oracle replays the FULL retrain over the new snapshot.

The honest PERFORMANCE twin builds the two artifacts in UNTIMED setup,
exports them to parquet and reads them back through views (storage
symmetry with Tables.servedArtifact), and times the same incremental
statement; both snapshots stay live VIEWS (the Spark cell derives them
from the documents scan inside the timed plan too).

Before timing, the incremental result is asserted equal (sorted rows)
to the full-retrain replay. Methodology: 2 runs x 2 passes, min.

Usage: python3 tools/bench_q155_lm.py <sfDir> <oracle_sql.json> [--update [file]]
"""
import sys, json, os, tempfile, time
import duckdb

HASH = "md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))"

BIGRAMS = r"""SELECT w[i] || ' ' || w[i+1] AS bigram
  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        FROM {src}),
    LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i)"""

SETUP = [
    # q145OldSnap: eval docs pinned, %17 removals, ' v1' mutations.
    """CREATE VIEW old_snap AS
       SELECT doc_id, lang,
         CASE WHEN doc_id % 13 = 0 AND doc_id % 20 <> 0
              THEN text || ' v1' ELSE text END AS text
       FROM documents WHERE doc_id % 17 <> 0 OR doc_id % 20 = 0""",
    """CREATE VIEW new_snap AS
       SELECT doc_id, lang, text FROM documents
       WHERE doc_id % 19 <> 0 OR doc_id % 20 = 0""",
    # Stored artifact 1: previous snapshot fingerprints.
    f"""CREATE TABLE prev_hashes AS
        SELECT doc_id, {HASH} AS content_hash FROM old_snap""",
    # Stored artifact 2: previous reference LM count model (en docs).
    f"""CREATE TABLE prev_model AS
        SELECT bigram, CAST(count(*) AS BIGINT) AS cnt
        FROM ({BIGRAMS.format(src="(SELECT * FROM old_snap WHERE lang = 'en')")})
        GROUP BY bigram""",
]

OLD_LEG = """(SELECT s.* FROM old_snap s
    SEMI JOIN (SELECT doc_id FROM delta
               WHERE status IN ('removed', 'changed')) x
      ON s.doc_id = x.doc_id
    WHERE s.lang = 'en')"""

NEW_LEG = """(SELECT s.* FROM new_snap s
    SEMI JOIN (SELECT doc_id FROM delta
               WHERE status IN ('added', 'changed')) x
      ON s.doc_id = x.doc_id
    WHERE s.lang = 'en')"""

INCREMENTAL = f"""WITH nh AS (
  SELECT doc_id, {HASH} AS new_hash FROM new_snap),
delta AS MATERIALIZED (
  SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
    CASE WHEN o.content_hash IS NULL THEN 'added'
         WHEN n.new_hash IS NULL THEN 'removed'
         WHEN o.content_hash <> n.new_hash THEN 'changed'
         ELSE 'unchanged' END AS status
  FROM prev_hashes o FULL OUTER JOIN nh n ON o.doc_id = n.doc_id),
minus AS (
  SELECT bigram, -CAST(count(*) AS BIGINT) AS d
  FROM ({BIGRAMS.format(src=OLD_LEG)})
  GROUP BY bigram),
plus AS (
  SELECT bigram, CAST(count(*) AS BIGINT) AS d
  FROM ({BIGRAMS.format(src=NEW_LEG)})
  GROUP BY bigram),
legs AS (
  SELECT bigram, cnt AS d FROM prev_model
  UNION ALL SELECT bigram, d FROM minus
  UNION ALL SELECT bigram, d FROM plus)
SELECT bigram, CAST(sum(d) AS BIGINT) AS cnt
FROM legs GROUP BY bigram HAVING sum(d) > 0"""

ARTIFACTS = ["prev_hashes", "prev_model"]


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
    full_sql = json.load(open(oracle_path))["q155_incremental_lm"]

    samples = []
    art_dir = tempfile.mkdtemp(prefix="q155_artifacts_")
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
    print(json.dumps({"query": "q155_incremental_lm", "sf": sf_dir,
                      "samples": [round(s, 4) for s in samples],
                      "min_sec": cell}))
    if update:
        with open(update) as f:
            base = json.load(f)
        old = base["queries"].get("q155_incremental_lm")
        base["queries"]["q155_incremental_lm"] = cell
        base["total"] = base["total"] - (old or 0) + cell
        with open(update, "w") as f:
            json.dump(base, f, indent=1)
        print(f"updated {update}: q155 {old} -> {cell}", file=sys.stderr)


if __name__ == "__main__":
    main()

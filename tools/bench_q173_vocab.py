#!/usr/bin/env python3
"""Record q173's structurally-matched DuckDB baseline cell.

q173 (tokenizer-vocab maintenance + refresh policy) consumes two stored
artifacts — the previous snapshot's fingerprints and its FULL 12-gram
unit-count model — and times only the maintenance machinery: one hash
pass over the new snapshot, the full-outer delta diff, window extraction
for the removed/changed (old text) and added/changed (new text) doc
sets, the three-leg union-sum combine, the top-2048 release cap, and the
refresh-policy diff against the stored model's own cap. Its correctness
oracle replays the FULL recompute of both snapshots' counts.

Storage symmetry with Tables.servedArtifact: artifacts are built in
UNTIMED setup, exported to parquet and read back through views; both
snapshots stay live VIEWS. Before timing, the incremental result is
asserted equal (sorted rows) to the full-recompute replay.
Methodology: 2 runs x 2 passes, min.

Usage: python3 tools/bench_q173_vocab.py <sfDir> <oracle_sql.json> [--update[=file]]
"""
import sys, json, os, tempfile, time
import duckdb

HASH = "md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))"

PARTS = " || '_' || ".join(f"ws[i+{j}]" for j in range(12))

WINDOWS = rf"""SELECT g AS word FROM (
    SELECT {PARTS} AS g
    FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ws
          FROM {{src}})
    CROSS JOIN unnest(generate_series(1, len(ws) - 11)) AS t(i)
    WHERE len(ws) >= 12)
  WHERE regexp_matches(g, '^[a-z]+(_[a-z]+){{{{11}}}}$')"""

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
    # Stored artifact 2: the previous snapshot's FULL unit-count model.
    f"""CREATE TABLE prev_units AS
        SELECT word, CAST(count(*) AS BIGINT) AS n
        FROM ({WINDOWS.format(src='old_snap')}) GROUP BY word""",
]

OLD_LEG = """(SELECT s.* FROM old_snap s
    SEMI JOIN (SELECT doc_id FROM delta
               WHERE status IN ('removed', 'changed')) x
      ON s.doc_id = x.doc_id)"""

NEW_LEG = """(SELECT s.* FROM new_snap s
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
minus AS (
  SELECT word, -CAST(count(*) AS BIGINT) AS d
  FROM ({WINDOWS.format(src=OLD_LEG)}) GROUP BY word),
plus AS (
  SELECT word, CAST(count(*) AS BIGINT) AS d
  FROM ({WINDOWS.format(src=NEW_LEG)}) GROUP BY word),
model AS MATERIALIZED (
  SELECT word, CAST(sum(d) AS BIGINT) AS n FROM (
    SELECT word, n AS d FROM prev_units
    UNION ALL SELECT word, d FROM minus
    UNION ALL SELECT word, d FROM plus)
  GROUP BY word HAVING sum(d) > 0),
newu AS MATERIALIZED (
  SELECT word, n FROM model ORDER BY n DESC, word LIMIT 2048),
oldu AS MATERIALIZED (
  SELECT word, n FROM prev_units ORDER BY n DESC, word LIMIT 2048),
diffc AS (
  SELECT CAST(count(*) AS BIGINT) AS changed FROM (
    (SELECT word, n FROM newu EXCEPT SELECT word, n FROM oldu)
    UNION ALL
    (SELECT word, n FROM oldu EXCEPT SELECT word, n FROM newu)))
SELECT 'unit' AS kind, word AS unit, n FROM newu
UNION ALL
SELECT 'policy_changed', CAST(NULL AS VARCHAR), changed FROM diffc
UNION ALL
SELECT 'policy_retrain', CAST(NULL AS VARCHAR),
  CASE WHEN changed > 0 THEN CAST(1 AS BIGINT)
       ELSE CAST(0 AS BIGINT) END
FROM diffc"""

ARTIFACTS = ["prev_hashes", "prev_units"]


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
    full_sql = json.load(open(oracle_path))["q173_vocab_maintain"]

    samples = []
    art_dir = tempfile.mkdtemp(prefix="q173_artifacts_")
    for run in range(2):
        print(f"run {run + 1}: setup (untimed stored artifacts)",
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
    print(json.dumps({"query": "q173_vocab_maintain", "sf": sf_dir,
                      "samples": [round(s, 4) for s in samples],
                      "min_sec": cell}))
    if update:
        with open(update) as f:
            base = json.load(f)
        old = base["queries"].get("q173_vocab_maintain")
        base["queries"]["q173_vocab_maintain"] = cell
        base["total"] = base["total"] - (old or 0) + cell
        with open(update, "w") as f:
            json.dump(base, f, indent=1)
        print(f"updated {update}: q173 {old} -> {cell}", file=sys.stderr)


if __name__ == "__main__":
    main()

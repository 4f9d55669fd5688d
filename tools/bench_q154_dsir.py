#!/usr/bin/env python3
"""Record q154's structurally-matched DuckDB baseline cell.

q154 (DSIR data selection) trains its two 4096-bucket count models once
(Tables.servedArtifact) and the timed Spark cell runs scoring only: one
feature pass over the corpus, two broadcast model joins, the per-doc
integer-bitlen aggregation, and the per-source top-32. The honest twin
builds the models in UNTIMED setup, exports them to parquet and reads
them back through views, then TIMES the same scoring statement. The
feature stream over the full corpus is recomputed inside the timed
statement on BOTH sides (only the models are stored).

Before timing, the stored-model result is asserted equal (sorted rows)
to the full oracle replay. Methodology: 2 runs x 2 passes, min.

Usage: python3 tools/bench_q154_dsir.py <sfDir> <oracle_sql.json> [--update [file]]
"""
import sys, json, os, tempfile, time
import duckdb

FEATS = r"""SELECT doc_id, substr(md5(f), 1, 3) AS bucket FROM (
    SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS f
    FROM documents
    UNION ALL
    SELECT doc_id, w[i] || ' ' || w[i+1] AS f
    FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
          FROM documents),
      LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i))
  WHERE length(trim(f)) > 0"""

SETUP = [
    f"""CREATE TABLE tmodel AS
        SELECT bucket, CAST(count(*) AS BIGINT) AS tc
        FROM ({FEATS}) WHERE doc_id % 20 = 0 GROUP BY bucket""",
    f"""CREATE TABLE rmodel AS
        SELECT bucket, CAST(count(*) AS BIGINT) AS rc
        FROM ({FEATS}) WHERE doc_id % 20 <> 0 GROUP BY bucket""",
]

SCORE = f"""WITH feats AS (
  {FEATS}),
per AS (
  SELECT f.doc_id,
    CAST(count(*) AS BIGINT) AS n_feats,
    CAST(sum(length(bin(COALESCE(t.tc, 0) + 1))) AS BIGINT) AS tbits,
    CAST(sum(length(bin(COALESCE(r.rc, 0) + 1))) AS BIGINT) AS rbits
  FROM feats f
  LEFT JOIN tmodel t USING (bucket)
  LEFT JOIN rmodel r USING (bucket)
  GROUP BY 1),
scored AS (
  SELECT d.doc_id, d.source,
    COALESCE(p.n_feats, 0) AS n_feats,
    COALESCE(p.tbits, 0) - COALESCE(p.rbits, 0) AS importance
  FROM documents d LEFT JOIN per p USING (doc_id))
SELECT doc_id, source, n_feats, importance, rank FROM (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY source ORDER BY importance DESC, doc_id) AS INT) AS rank
  FROM scored)
WHERE rank <= 32"""

ARTIFACTS = ["tmodel", "rmodel"]


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
    full_sql = json.load(open(oracle_path))["q154_dsir_select"]

    samples = []
    art_dir = tempfile.mkdtemp(prefix="q154_artifacts_")
    for run in range(2):
        print(f"run {run + 1}: setup (untimed stored models)",
              file=sys.stderr)
        con = fresh_con(sf_dir, art_dir)
        if run == 0:
            got = sorted(con.execute(SCORE).fetchall())
            full = sorted(con.execute(full_sql).fetchall())
            assert got == full, (
                f"stored-model != full replay: {len(got)} vs {len(full)}")
            print(f"  equivalence check: OK ({len(got)} rows)",
                  file=sys.stderr)
        for p in range(2):
            t0 = time.monotonic()
            con.execute(SCORE).fetchall()
            dt = time.monotonic() - t0
            samples.append(dt)
            print(f"  pass {p + 1}: {dt:.3f}s", file=sys.stderr)
        con.close()

    cell = min(samples)
    print(json.dumps({"query": "q154_dsir_select", "sf": sf_dir,
                      "samples": [round(s, 4) for s in samples],
                      "min_sec": cell}))
    if update:
        with open(update) as f:
            base = json.load(f)
        old = base["queries"].get("q154_dsir_select")
        base["queries"]["q154_dsir_select"] = cell
        base["total"] = base["total"] - (old or 0) + cell
        with open(update, "w") as f:
            json.dump(base, f, indent=1)
        print(f"updated {update}: q154 {old} -> {cell}", file=sys.stderr)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Record q145's structurally-matched DuckDB baseline cell.

Round 12 benched q145 (incremental corpus build) against a DuckDB cell
that replays the FULL REBUILD — the correctness oracle, but the wrong
performance twin: Spark runs delta-diff + reuse joins + delta-only
stages while the baseline re-derives everything, so the published ratio
compared two different algorithms (VERDICT r12 "What's wrong #2").

This script records the honest cell: DuckDB replays the INCREMENTAL
machinery itself. The stored artifacts the Spark side reads via
`Tables.servedArtifact` (previous build manifest, previous snapshot
fingerprints, eval window set, LM bigram model) become physical tables
created in UNTIMED setup — the exact analog of Spark's build-once
artifact amortization (and of the base-table views both benches already
use). The timed statement then runs only what the incremental algorithm
runs: one hash pass over the new snapshot, the full-outer delta diff,
reuse joins against the stored manifest, global canonical recompute from
hashes alone, and decon+LM on the delta/promoted survivors.

Before timing, the incremental SQL's result is verified equal (sorted
row set) to the full-rebuild replay — the same batch≡incremental
equivalence the Spark oracle proves, asserted here so the recorded cell
can never drift from the semantics it claims to time.

Storage symmetry: the Spark side reads every stored artifact from
PARQUET on each run (Tables.servedArtifact) and derives the new
snapshot live from the documents table — so here the artifacts are
exported to parquet in setup and served through read_parquet VIEWS (the
same arrangement bench_oracle.py uses for the base tables), and
new_snap is a view over the documents view, not a materialized table.
In-memory artifact tables would hand DuckDB a head start Spark's cell
does not get.

Methodology matches tools/bench_oracle.py: full materialization
(fetchall), 2 runs x 2 passes, per-cell MIN (a host stall never makes a
query faster).

Usage: python3 tools/bench_q145_incremental.py <sfDir> [--update BASELINE_DUCKDB.json]
"""
import sys, json, os, tempfile, time
import duckdb

HASH = "md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))"
WC = "len(string_split_regex(trim(text), '\\s+'))"

SETUP = [
    # The two crawl snapshots (graft.Queries.q145OldSnap / q145NewSnap):
    # eval docs (doc_id % 20 = 0) pinned identical; mutations (' v1' on
    # every 13th doc) and removals (%17 old / %19 new) touch training only.
    """CREATE TABLE old_snap AS
       SELECT doc_id,
         CASE WHEN doc_id % 13 = 0 AND doc_id % 20 <> 0
              THEN text || ' v1' ELSE text END AS text
       FROM documents WHERE doc_id % 17 <> 0 OR doc_id % 20 = 0""",
    # new_snap stays a VIEW: Spark derives it live from the documents
    # parquet each run; materializing it would be asymmetric.
    """CREATE VIEW new_snap AS
       SELECT doc_id, text FROM documents
       WHERE doc_id % 19 <> 0 OR doc_id % 20 = 0""",
    # Stored artifact 1: previous snapshot fingerprint table
    # (graft.Queries.prevSnapshotHashes).
    f"""CREATE TABLE prev_hashes AS
        SELECT doc_id, {HASH} AS content_hash FROM old_snap""",
    # Stored artifact 2: the previous crawl's build manifest — the full
    # q143 chain over old_snap incl. content_hash
    # (graft.Queries.prevCorpusBuild). LM model trains on the FULL
    # documents table (a release constant), matching Spark's lmModel.
    f"""CREATE TABLE prev_build AS
        WITH q AS (
          SELECT doc_id, text, {WC} BETWEEN 25 AND 90 AS pass_quality
          FROM old_snap WHERE doc_id % 20 <> 0),
        h AS (SELECT doc_id, {HASH} AS hh FROM q WHERE pass_quality),
        c AS (SELECT hh, min(doc_id) AS canon FROM h GROUP BY hh),
        ex AS (SELECT h.doc_id, h.doc_id = c.canon AS pass_exact, h.hh
               FROM h JOIN c USING (hh)),
        surv AS (SELECT q.doc_id, q.text FROM q JOIN ex USING (doc_id)
                 WHERE q.pass_quality AND ex.pass_exact),
        dtok AS (
          SELECT doc_id, TRUE AS ev,
            string_split_regex(trim(lower(text)), '\\s+') AS ws
          FROM old_snap WHERE doc_id % 20 = 0
          UNION ALL
          SELECT doc_id, FALSE,
            string_split_regex(trim(lower(text)), '\\s+') FROM surv),
        ew AS (
          SELECT DISTINCT array_to_string(ws[i+1 : i+8], ' ') AS key
          FROM dtok CROSS JOIN unnest(generate_series(0, len(ws) - 8)) AS g(i)
          WHERE ev AND len(ws) >= 8),
        m AS (
          SELECT t.doc_id, i AS p
          FROM dtok t CROSS JOIN unnest(generate_series(0, len(ws) - 8)) AS g(i)
          WHERE NOT ev AND len(ws) >= 8
            AND array_to_string(ws[i+1 : i+8], ' ') IN (SELECT key FROM ew)),
        dkept AS (
          SELECT t.doc_id, i, t.ws[i] AS tokn
          FROM dtok t CROSS JOIN unnest(generate_series(1, len(t.ws))) AS g(i)
          WHERE NOT t.ev AND NOT EXISTS (SELECT 1 FROM m
            WHERE m.doc_id = t.doc_id AND i BETWEEN m.p + 1 AND m.p + 8)),
        dagg AS (
          SELECT doc_id, count(*) AS n_kept,
            string_agg(tokn, ' ' ORDER BY i) AS txt
          FROM dkept GROUP BY doc_id),
        decon AS (
          SELECT t.doc_id,
            (len(t.ws) - coalesce(a.n_kept, 0)) * 100 <= len(t.ws) * 20
              AS pass_decon,
            CASE WHEN (len(t.ws) - coalesce(a.n_kept, 0)) * 100
                      <= len(t.ws) * 20
                 THEN coalesce(a.txt, '') ELSE '' END AS decon_text
          FROM dtok t LEFT JOIN dagg a USING (doc_id) WHERE NOT t.ev),
        ltok AS (
          SELECT doc_id, lang,
            string_split_regex(trim(lower(text)), '\\s+') AS ws
          FROM documents),
        lbg AS (
          SELECT doc_id, lang, z[1] || ' ' || z[2] AS bigram
          FROM (SELECT doc_id, lang,
                  unnest(list_zip(ws[1:len(ws)-1], ws[2:len(ws)])) AS z
                FROM ltok)),
        lm AS (
          SELECT bigram, CAST(count(*) AS BIGINT) AS cnt
          FROM lbg WHERE lang = 'en' GROUP BY bigram),
        sbg AS (
          SELECT doc_id, z[1] || ' ' || z[2] AS bigram
          FROM (SELECT doc_id,
                  unnest(list_zip(ws2[1:len(ws2)-1], ws2[2:len(ws2)])) AS z
                FROM (SELECT doc_id,
                        string_split_regex(trim(lower(decon_text)), '\\s+') AS ws2
                      FROM decon WHERE pass_decon))),
        sc AS (
          SELECT b.doc_id, CAST(count(*) AS BIGINT) AS nb,
            CAST(count(l.cnt) AS BIGINT) AS nh
          FROM sbg b LEFT JOIN lm l USING (bigram) GROUP BY b.doc_id),
        lmflag AS (SELECT doc_id, nh * 2 >= nb AND nb > 0 AS pass_lm FROM sc)
        SELECT q.doc_id, q.pass_quality,
          coalesce(ex.pass_exact, FALSE) AS pass_exact,
          coalesce(d.pass_decon, FALSE) AS pass_decon,
          coalesce(lf.pass_lm, FALSE) AS pass_lm,
          (q.pass_quality AND coalesce(ex.pass_exact, FALSE)
            AND coalesce(d.pass_decon, FALSE)
            AND coalesce(lf.pass_lm, FALSE)) AS keep,
          CASE WHEN q.pass_quality AND coalesce(ex.pass_exact, FALSE)
                    AND coalesce(d.pass_decon, FALSE)
                    AND coalesce(lf.pass_lm, FALSE)
               THEN coalesce(d.decon_text, '') ELSE '' END AS final_text,
          ex.hh AS content_hash
        FROM q
        LEFT JOIN ex ON q.doc_id = ex.doc_id
        LEFT JOIN decon d ON q.doc_id = d.doc_id
        LEFT JOIN lmflag lf ON q.doc_id = lf.doc_id""",
    # Stored artifact 3: the eval suite's 8-token window-key set
    # (graft.Queries.evalWindowKeys — identical across snapshots).
    """CREATE TABLE eval_windows AS
       SELECT DISTINCT array_to_string(ws[i+1 : i+8], ' ') AS key
       FROM (SELECT string_split_regex(trim(lower(text)), '\\s+') AS ws
             FROM documents WHERE doc_id % 20 = 0)
       CROSS JOIN unnest(generate_series(0, len(ws) - 8)) AS g(i)
       WHERE len(ws) >= 8""",
    # Stored artifact 4: the LM bigram count model (graft.Queries.lmModel).
    """CREATE TABLE lm_model AS
       WITH ltok AS (
         SELECT doc_id, lang,
           string_split_regex(trim(lower(text)), '\\s+') AS ws
         FROM documents),
       lbg AS (
         SELECT doc_id, lang, z[1] || ' ' || z[2] AS bigram
         FROM (SELECT doc_id, lang,
                 unnest(list_zip(ws[1:len(ws)-1], ws[2:len(ws)])) AS z
               FROM ltok))
       SELECT bigram, CAST(count(*) AS BIGINT) AS cnt
       FROM lbg WHERE lang = 'en' GROUP BY bigram""",
]

# The timed statement: ONLY what graft.Queries.q145IncrementalCorpusBuild
# computes live — hash pass over the new snapshot, full-outer delta diff
# vs stored fingerprints, reuse joins vs the stored manifest, global
# canonical recompute from hashes, decon+LM on delta/promoted survivors,
# one left-join assembly chain.
INCREMENTAL = f"""WITH nh AS (
  SELECT doc_id, {HASH} AS new_hash FROM new_snap),
delta AS (
  SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
    CASE WHEN o.content_hash IS NULL THEN 'added'
         WHEN n.new_hash IS NULL THEN 'removed'
         WHEN o.content_hash <> n.new_hash THEN 'changed'
         ELSE 'unchanged' END AS status
  FROM prev_hashes o FULL OUTER JOIN nh n ON o.doc_id = n.doc_id),
unchanged AS (SELECT doc_id FROM delta WHERE status = 'unchanged'),
changed AS (SELECT doc_id FROM delta WHERE status IN ('added', 'changed')),
prevu AS (
  SELECT p.doc_id, p.pass_quality AS prev_quality,
    p.pass_exact AS prev_exact, p.pass_decon AS prev_decon,
    p.pass_lm AS prev_lm, p.final_text AS prev_final, p.content_hash
  FROM prev_build p SEMI JOIN unchanged u ON p.doc_id = u.doc_id),
qdelta AS (
  SELECT s.doc_id, s.text, {WC} BETWEEN 25 AND 90 AS d_quality,
    CASE WHEN {WC} BETWEEN 25 AND 90 THEN {HASH} END AS content_hash
  FROM new_snap s SEMI JOIN changed c ON s.doc_id = c.doc_id
  WHERE s.doc_id % 20 <> 0),
hashes AS (
  SELECT doc_id, content_hash FROM prevu WHERE prev_quality
  UNION ALL
  SELECT doc_id, content_hash FROM qdelta WHERE d_quality),
canon AS (
  SELECT content_hash, min(doc_id) AS canon FROM hashes GROUP BY content_hash),
exn AS (
  SELECT h.doc_id, h.doc_id = c.canon AS n_exact
  FROM hashes h JOIN canon c USING (content_hash)),
promoted AS (
  SELECT p.doc_id FROM prevu p JOIN exn e USING (doc_id)
  WHERE e.n_exact AND NOT p.prev_exact),
rcsurv AS (
  SELECT q.doc_id, q.text FROM qdelta q JOIN exn e USING (doc_id)
  WHERE q.d_quality AND e.n_exact
  UNION ALL
  SELECT s.doc_id, s.text
  FROM new_snap s SEMI JOIN promoted p ON s.doc_id = p.doc_id),
dtok AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ws
  FROM rcsurv),
m AS (
  SELECT t.doc_id, i AS p
  FROM dtok t CROSS JOIN unnest(generate_series(0, len(ws) - 8)) AS g(i)
  WHERE len(ws) >= 8
    AND array_to_string(ws[i+1 : i+8], ' ') IN (SELECT key FROM eval_windows)),
dkept AS (
  SELECT t.doc_id, i, t.ws[i] AS tokn
  FROM dtok t CROSS JOIN unnest(generate_series(1, len(t.ws))) AS g(i)
  WHERE NOT EXISTS (SELECT 1 FROM m
    WHERE m.doc_id = t.doc_id AND i BETWEEN m.p + 1 AND m.p + 8)),
dagg AS (
  SELECT doc_id, count(*) AS n_kept,
    string_agg(tokn, ' ' ORDER BY i) AS txt
  FROM dkept GROUP BY doc_id),
decon AS (
  SELECT t.doc_id,
    (len(t.ws) - coalesce(a.n_kept, 0)) * 100 <= len(t.ws) * 20 AS d_decon,
    CASE WHEN (len(t.ws) - coalesce(a.n_kept, 0)) * 100 <= len(t.ws) * 20
         THEN coalesce(a.txt, '') ELSE '' END AS decon_text
  FROM dtok t LEFT JOIN dagg a USING (doc_id)),
sbg AS (
  SELECT doc_id, z[1] || ' ' || z[2] AS bigram
  FROM (SELECT doc_id,
          unnest(list_zip(ws2[1:len(ws2)-1], ws2[2:len(ws2)])) AS z
        FROM (SELECT doc_id,
                string_split_regex(trim(lower(decon_text)), '\\s+') AS ws2
              FROM decon WHERE d_decon))),
sc AS (
  SELECT b.doc_id, CAST(count(*) AS BIGINT) AS nb,
    CAST(count(l.cnt) AS BIGINT) AS nh2
  FROM sbg b LEFT JOIN lm_model l USING (bigram) GROUP BY b.doc_id),
lmflag AS (SELECT doc_id, nh2 * 2 >= nb AND nb > 0 AS d_lm FROM sc),
ids AS (SELECT doc_id FROM new_snap WHERE doc_id % 20 <> 0),
asm AS (
  SELECT i.doc_id,
    coalesce(q.d_quality, p.prev_quality, FALSE) AS pass_quality,
    coalesce(e.n_exact, FALSE) AS pass_exact,
    p.prev_decon, p.prev_lm, p.prev_final,
    d.d_decon, d.decon_text, lf.d_lm,
    (q.d_quality IS NOT NULL
      OR (coalesce(e.n_exact, FALSE)
          AND NOT coalesce(p.prev_exact, FALSE))) AS rc
  FROM ids i
  LEFT JOIN prevu p USING (doc_id)
  LEFT JOIN qdelta q USING (doc_id)
  LEFT JOIN exn e USING (doc_id)
  LEFT JOIN decon d USING (doc_id)
  LEFT JOIN lmflag lf USING (doc_id)),
fin AS (
  SELECT doc_id, pass_quality, pass_exact,
    CASE WHEN NOT (pass_quality AND pass_exact) THEN FALSE
         WHEN rc THEN coalesce(d_decon, FALSE)
         ELSE coalesce(prev_decon, FALSE) END AS pass_decon,
    CASE WHEN NOT (pass_quality AND pass_exact) THEN FALSE
         WHEN rc THEN coalesce(d_lm, FALSE)
         ELSE coalesce(prev_lm, FALSE) END AS pass_lm,
    rc, decon_text, prev_final
  FROM asm)
SELECT doc_id, pass_quality, pass_exact, pass_decon, pass_lm,
  (pass_quality AND pass_exact AND pass_decon AND pass_lm) AS keep,
  CASE WHEN NOT (pass_quality AND pass_exact AND pass_decon AND pass_lm)
         THEN ''
       WHEN rc THEN coalesce(decon_text, '')
       ELSE coalesce(prev_final, '') END AS final_text,
  CAST(CASE WHEN pass_quality AND pass_exact AND pass_decon AND pass_lm
            THEN doc_id % 16 ELSE -1 END AS INT) AS shard
FROM fin"""

# The full-rebuild replay over the new snapshot (the correctness oracle,
# Oracles.scala q145) — run ONCE, untimed, to assert the incremental
# statement computes the identical manifest before its time is recorded.
FULL_REBUILD = f"""WITH q AS (
  SELECT doc_id, text, {WC} BETWEEN 25 AND 90 AS pass_quality
  FROM new_snap WHERE doc_id % 20 <> 0),
h AS (SELECT doc_id, {HASH} AS hh FROM q WHERE pass_quality),
c AS (SELECT hh, min(doc_id) AS canon FROM h GROUP BY hh),
ex AS (SELECT h.doc_id, h.doc_id = c.canon AS pass_exact
       FROM h JOIN c USING (hh)),
surv AS (SELECT q.doc_id, q.text FROM q JOIN ex USING (doc_id)
         WHERE q.pass_quality AND ex.pass_exact),
dtok AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ws
  FROM surv),
m AS (
  SELECT t.doc_id, i AS p
  FROM dtok t CROSS JOIN unnest(generate_series(0, len(ws) - 8)) AS g(i)
  WHERE len(ws) >= 8
    AND array_to_string(ws[i+1 : i+8], ' ') IN (SELECT key FROM eval_windows)),
dkept AS (
  SELECT t.doc_id, i, t.ws[i] AS tokn
  FROM dtok t CROSS JOIN unnest(generate_series(1, len(t.ws))) AS g(i)
  WHERE NOT EXISTS (SELECT 1 FROM m
    WHERE m.doc_id = t.doc_id AND i BETWEEN m.p + 1 AND m.p + 8)),
dagg AS (
  SELECT doc_id, count(*) AS n_kept,
    string_agg(tokn, ' ' ORDER BY i) AS txt
  FROM dkept GROUP BY doc_id),
decon AS (
  SELECT t.doc_id,
    (len(t.ws) - coalesce(a.n_kept, 0)) * 100 <= len(t.ws) * 20
      AS pass_decon,
    CASE WHEN (len(t.ws) - coalesce(a.n_kept, 0)) * 100 <= len(t.ws) * 20
         THEN coalesce(a.txt, '') ELSE '' END AS decon_text
  FROM dtok t LEFT JOIN dagg a USING (doc_id)),
sbg AS (
  SELECT doc_id, z[1] || ' ' || z[2] AS bigram
  FROM (SELECT doc_id,
          unnest(list_zip(ws2[1:len(ws2)-1], ws2[2:len(ws2)])) AS z
        FROM (SELECT doc_id,
                string_split_regex(trim(lower(decon_text)), '\\s+') AS ws2
              FROM decon WHERE pass_decon))),
sc AS (
  SELECT b.doc_id, CAST(count(*) AS BIGINT) AS nb,
    CAST(count(l.cnt) AS BIGINT) AS nh
  FROM sbg b LEFT JOIN lm_model l USING (bigram) GROUP BY b.doc_id),
lmflag AS (SELECT doc_id, nh * 2 >= nb AND nb > 0 AS pass_lm FROM sc)
SELECT q.doc_id, q.pass_quality,
  coalesce(ex.pass_exact, FALSE) AS pass_exact,
  coalesce(d.pass_decon, FALSE) AS pass_decon,
  coalesce(lf.pass_lm, FALSE) AS pass_lm,
  (q.pass_quality AND coalesce(ex.pass_exact, FALSE)
    AND coalesce(d.pass_decon, FALSE)
    AND coalesce(lf.pass_lm, FALSE)) AS keep,
  CASE WHEN q.pass_quality AND coalesce(ex.pass_exact, FALSE)
            AND coalesce(d.pass_decon, FALSE)
            AND coalesce(lf.pass_lm, FALSE)
       THEN coalesce(d.decon_text, '') ELSE '' END AS final_text,
  CAST(CASE WHEN q.pass_quality AND coalesce(ex.pass_exact, FALSE)
                 AND coalesce(d.pass_decon, FALSE)
                 AND coalesce(lf.pass_lm, FALSE)
            THEN q.doc_id % 16 ELSE -1 END AS INT) AS shard
FROM q
LEFT JOIN ex ON q.doc_id = ex.doc_id
LEFT JOIN decon d ON q.doc_id = d.doc_id
LEFT JOIN lmflag lf ON q.doc_id = lf.doc_id"""

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


ARTIFACTS = ["prev_hashes", "prev_build", "eval_windows", "lm_model"]


def fresh_con(sf_dir, art_dir):
    con = duckdb.connect()
    for t in TABLES:
        # Tolerate partial dirs (the synthesized 10x corpus ships only
        # documents/embeddings); the twin reads only `documents`.
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):  # Spark-written dir of part files
            p = os.path.join(p, "*.parquet")
        elif not os.path.exists(p):
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    for i, ddl in enumerate(SETUP):
        t0 = time.monotonic()
        con.execute(ddl)
        print(f"  setup {i + 1}/{len(SETUP)}: "
              f"{time.monotonic() - t0:.2f}s", file=sys.stderr)
    # Storage symmetry with Spark's servedArtifact: artifacts live on
    # parquet and are re-read by the timed statement through views.
    for a in ARTIFACTS:
        p = os.path.join(art_dir, f"{a}.parquet")
        con.execute(f"COPY {a} TO '{p}' (FORMAT PARQUET)")
        con.execute(f"DROP TABLE {a}")
        con.execute(f"CREATE VIEW {a} AS SELECT * FROM read_parquet('{p}')")
    return con


def main():
    sf_dir = sys.argv[1]
    update = sys.argv[3] if len(sys.argv) > 3 and sys.argv[2] == "--update" \
        else (sys.argv[2].split("=", 1)[1] if len(sys.argv) > 2
              and sys.argv[2].startswith("--update=") else None)
    if update is None and "--update" in sys.argv:
        update = "BASELINE_DUCKDB.json"

    samples = []
    art_dir = tempfile.mkdtemp(prefix="q145_artifacts_")
    for run in range(2):
        print(f"run {run + 1}: setup (untimed stored artifacts)",
              file=sys.stderr)
        con = fresh_con(sf_dir, art_dir)
        if run == 0:
            # Faithfulness gate: incremental ≡ full rebuild, untimed.
            inc = sorted(con.execute(INCREMENTAL).fetchall())
            full = sorted(con.execute(FULL_REBUILD).fetchall())
            assert inc == full, (
                "incremental replay != full rebuild: "
                f"{len(inc)} vs {len(full)} rows; first diff: "
                f"{next((a, b) for a, b in zip(inc, full) if a != b)}")
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
    out = {"query": "q145_incremental_corpus", "sf": sf_dir,
           "samples": [round(s, 4) for s in samples],
           "min_sec": cell,
           "method": "incremental-machinery replay; stored artifacts as "
                     "untimed setup tables; 2 runs x 2 passes, min"}
    print(json.dumps(out))
    if update:
        with open(update) as f:
            base = json.load(f)
        old = base["queries"].get("q145_incremental_corpus")
        base["queries"]["q145_incremental_corpus"] = cell
        if old is not None:
            base["total"] = base["total"] - old + cell
        with open(update, "w") as f:
            json.dump(base, f, indent=1)
        print(f"updated {update}: q145 {old} -> {cell}", file=sys.stderr)


if __name__ == "__main__":
    main()

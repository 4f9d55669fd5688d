package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min Sketch frequency estimation + heavy hitters (Cormode &
  * Muthukrishnan 2005, public) — the bounded-memory frequency sketch
  * next to [[graft.functions.KmvDistinct]]'s cardinality sketch and the
  * MinHash/SimHash similarity sketches: [[Depth]] seeded hash rows of
  * 16^[[BucketHexChars]] counters each, so the ENTIRE sketch is at most
  * Depth·4096 integer cells no matter how large the corpus — it
  * broadcasts, it merges by cell-wise addition (integer sums, so
  * map-side combine IS the merge), and a point estimate reads Depth
  * cells. Estimates never undercount (each of a word's cells holds its
  * true count plus nonneg collision mass), so min-over-rows heavy-hitter
  * detection has perfect recall and only one-sided error.
  *
  * Portability: buckets are md5-prefix STRINGS seeded per row
  * (`md5(i || ':' || word)` — the portable-MinHash idiom), counters are
  * exact integer sums, and the estimate is an integer min — every step
  * replays bit-for-bit in another engine, so unlike a float sketch the
  * oracle hash-checks the whole pipeline.
  */
object Cms {

  /** Hash rows in the sketch. */
  val Depth = 4

  /** Bucket key width in md5 hex chars: 3 → 16³ = 4096 counters/row. */
  val BucketHexChars = 3

  private def bucketOf(i: Column, item: Column): Column =
    substring(md5(concat(i.cast("string"), lit(":"), item)), 1, BucketHexChars)

  /** The Depth cell keys of every occurrence: (i, bucket), Depth rows
    * per input row — [[sketch]]'s pre-aggregation stream and the ±
    * occurrence legs of [[maintainSketch]]. */
  private def cellKeys(items: DataFrame, itemCol: String): DataFrame =
    items
      .select(explode(sequence(lit(0), lit(Depth - 1))).as("i"),
        col(itemCol).as("_it"))
      .select(col("i"), bucketOf(col("i"), col("_it")).as("bucket"))

  /** Build the sketch over an item stream WITH multiplicity (one input
    * row = one increment): (i, bucket, cnt), at most Depth·4096 rows.
    * One explode (Depth rows per item) + one map-side-combined count —
    * the combine is the sketch MERGE, so partitions/streams union for
    * free. */
  def sketch(items: DataFrame, itemCol: String): DataFrame =
    cellKeys(items, itemCol)
      .groupBy(col("i"), col("bucket")).agg(count(lit(1)).as("cnt"))

  /** INCREMENTAL sketch maintenance across corpus snapshots (q180 — the
    * q155/q160 abelian-group shape at the SKETCH layer): every CMS cell
    * is an integer occurrence count, so the new crawl's sketch is
    * EXACTLY prev − removed/changed-old occurrences' cells +
    * added/changed-new occurrences' cells, zero cells dropped (a fresh
    * build never emits them). Unchanged documents are never re-tokenized
    * or re-hashed; one map-side-combined sum over (stored cells ∪ the ±
    * delta legs) — cell-bounded output (≤ Depth·4096 rows) at any corpus
    * size. `minusItems`/`plusItems`: one row per removed/added
    * occurrence. */
  def maintainSketch(prevCells: DataFrame, minusItems: DataFrame,
                     plusItems: DataFrame, itemCol: String): DataFrame =
    AdditiveCounts.maintain(prevCells, Seq("i", "bucket"),
      cellKeys(minusItems, itemCol), cellKeys(plusItems, itemCol))

  /** Signed cell legs for a streaming micro-batch ([[graft.streaming
    * .MaintainStream]]'s generic keyed fold — the CMS instantiation of
    * the versioned exactly-once store): one (i, bucket, d = ±1) row per
    * removed/added occurrence, [[maintainSketch]]'s ± legs in
    * change-feed form. The micro-batch fold then sums them into the
    * stored cells — cell-bounded state (≤ Depth·4096 rows) no matter
    * how long the stream runs. */
  def signedCellLegs(minusItems: DataFrame, plusItems: DataFrame,
                     itemCol: String): DataFrame =
    cellKeys(minusItems, itemCol).withColumn("d", lit(-1L))
      .unionByName(cellKeys(plusItems, itemCol).withColumn("d", lit(1L)))

  /** The q180 maintain-and-serve chain as ONE guarded task — the
    * q153/q175/q176 treatment: the distributed chain (hash diff, two
    * delta word legs, the cell combine, the panel probe) is ~10
    * delta-sized stages of pure scheduling latency at serving scale
    * (measured 2.3-2.6 s at sf0.1 against a ~0.3 s twin). The five
    * stored inputs ride a tagged union (no driver collect) into one
    * `mapPartitions` task that mirrors it step for step:
    * [[LocalText.contentHash]] statuses, Spark-semantics word
    * extraction (lower → trim → split, empties dropped), the ± cell
    * fold with zero cells dropped once at the end (sums commute), the
    * row-0 total, and the min-over-rows panel estimates with the
    * zero-miss contract. Callers guard fail-CLOSED on Catalyst size
    * stats; cross-tier equality is spec'd and the oracle replays the
    * full rebuild. Output: (word, est, is_heavy). */
  def maintainServeLocal(prevCells: DataFrame, prevHashes: DataFrame,
                         oldDocs: DataFrame, newDocs: DataFrame,
                         idCol: String, textCol: String,
                         panelPred: Column): DataFrame = {
    val spark = prevCells.sparkSession
    import spark.implicits._
    val nullL = lit(null).cast("long")
    val nullI = lit(null).cast("int")
    val tagged = prevCells.select(lit("c").as("_t"), col("i").as("_i"),
        col("bucket").as("_s"), col("cnt").cast("long").as("_l"),
        nullL.as("_id"), lit(false).as("_p"))
      .unionByName(prevHashes.select(lit("h").as("_t"), nullI.as("_i"),
        col("content_hash").as("_s"), nullL.as("_l"),
        col("doc_id").cast("long").as("_id"), lit(false).as("_p")))
      .unionByName(oldDocs.select(lit("o").as("_t"), nullI.as("_i"),
        col(textCol).as("_s"), nullL.as("_l"),
        col(idCol).cast("long").as("_id"), lit(false).as("_p")))
      // coalesce: a null predicate value (e.g. a null doc attribute)
      // means NOT in the panel on both tiers — the distributed serve's
      // filter drops null the same way; a bare getBoolean on a null
      // would NPE here instead, a tier divergence on edge-case input.
      .unionByName(newDocs.select(lit("n").as("_t"), nullI.as("_i"),
        col(textCol).as("_s"), nullL.as("_l"),
        col(idCol).cast("long").as("_id"),
        coalesce(panelPred, lit(false)).as("_p")))
    val depth = Depth
    val hexChars = BucketHexChars
    tagged.coalesce(1).mapPartitions { it =>
      import scala.collection.mutable
      val cells = mutable.HashMap.empty[(Int, String), Long]
      val prevHash = mutable.HashMap.empty[Long, String]
      val oldText = mutable.HashMap.empty[Long, String]
      val newText = mutable.HashMap.empty[Long, String]
      val panelIds = mutable.HashSet.empty[Long]
      it.foreach { row =>
        row.getString(0) match {
          case "c" => cells.update((row.getInt(1), row.getString(2)),
            row.getLong(3))
          case "h" => prevHash.update(row.getLong(4), row.getString(2))
          case "o" => oldText.update(row.getLong(4),
            if (row.isNullAt(2)) "" else row.getString(2))
          case _ =>
            newText.update(row.getLong(4),
              if (row.isNullAt(2)) "" else row.getString(2))
            if (row.getBoolean(5)) panelIds += row.getLong(4)
        }
      }
      // Spark-semantics word stream: words(lower(text)), empties dropped.
      def wordsOf(text: String): Array[String] =
        LocalText.words(text.toLowerCase())
          .filter(w => LocalText.trimSpaces(w).nonEmpty)
      // Buckets memoized per DISTINCT word: the fold hashes every
      // occurrence otherwise (Depth md5s each) and word streams repeat
      // heavily — the cache turns ~10^6 digests into vocabulary-many.
      val bucketCache = mutable.HashMap.empty[String, Array[String]]
      def bucketsOf(w: String): Array[String] =
        bucketCache.getOrElseUpdate(w, Array.tabulate(depth)(i =>
          LocalText.md5Hex(i.toString + ":" + w).substring(0, hexChars)))
      def fold(text: String, sign: Long): Unit =
        wordsOf(text).foreach { w =>
          val bs = bucketsOf(w)
          var i = 0
          while (i < depth) {
            val k = (i, bs(i))
            cells.update(k, cells.getOrElse(k, 0L) + sign)
            i += 1
          }
        }
      // Hash-diff statuses (diffHashed's comparison, per doc).
      newText.foreach { case (id, t) =>
        prevHash.get(id) match {
          case None => fold(t, 1L) // added
          case Some(h) =>
            if (h != LocalText.contentHash(t)) { // changed
              fold(oldText.getOrElse(id, ""), -1L); fold(t, 1L)
            }
        }
      }
      prevHash.keysIterator.foreach(id =>
        if (!newText.contains(id)) fold(oldText.getOrElse(id, ""), -1L))
      // Zero cells drop ONCE at the end (per-key sums commute, and with
      // true deltas the running value equals the true cell count).
      val live = cells.filter(_._2 > 0L)
      var n = 0L
      live.foreach { case ((i, _), c) => if (i == 0) n += c }
      val panel = mutable.HashSet.empty[String]
      panelIds.foreach(id => wordsOf(newText(id)).foreach(panel += _))
      panel.iterator.map { w =>
        val bs = bucketsOf(w)
        var est = Long.MaxValue
        var i = 0
        while (i < depth) {
          est = math.min(est, live.getOrElse((i, bs(i)), 0L))
          i += 1
        }
        (w, est, est * 200 >= n)
      }
    }.toDF("word", "est", "is_heavy")
  }

  /** The q181 CHAIN tier: [[maintainServeLocal]] generalized to a
    * CONSECUTIVE crawl chain (the [[graft.ops.LmScore
    * .maintainCountsChainLocal]] treatment at the sketch layer) — n−1
    * maintenance steps folded in ONE task. Statuses re-derive per doc
    * from content hashes in-task ([[LocalText.contentHash]], the same
    * comparison diffHashed makes); signed partials carry ACROSS steps
    * and zeros drop once at the end — equivalent to the per-step drop
    * because with true snapshot deltas the running cell value equals
    * the intermediate stream's true count. `snapshots`: first = the
    * stored cells' snapshot, each later one folds as a step against its
    * predecessor; `panelPred` selects the probe panel docs on the FINAL
    * snapshot. Callers guard fail-CLOSED on Catalyst size stats.
    * Output: (word, est, is_heavy) — [[maintainServeLocal]]'s serve. */
  def maintainServeChainLocal(prevCells: DataFrame,
                              snapshots: Seq[DataFrame],
                              idCol: String, textCol: String,
                              panelPred: Column): DataFrame = {
    require(snapshots.size >= 2, "maintainServeChainLocal needs >= 2 snapshots")
    val spark = prevCells.sparkSession
    import spark.implicits._
    val nullL = lit(null).cast("long")
    val nullS = lit(null).cast("string")
    val nSnaps = snapshots.size
    val cellRows = prevCells.select(lit(-1).as("_snap"),
      col("i").as("_i"), col("bucket").as("_b"),
      col("cnt").cast("long").as("_cnt"), nullL.as("_id"),
      nullS.as("_s"), lit(false).as("_p"))
    val snapRows = snapshots.zipWithIndex.map { case (df, k) =>
      df.select(lit(k).as("_snap"), lit(null).cast("int").as("_i"),
        nullS.as("_b"), nullL.as("_cnt"), col(idCol).cast("long").as("_id"),
        col(textCol).as("_s"), coalesce(panelPred, lit(false)).as("_p"))
    }.reduce(_ unionByName _)
    val depth = Depth
    val hexChars = BucketHexChars
    cellRows.unionByName(snapRows).coalesce(1).mapPartitions { it =>
      import scala.collection.mutable
      val cells = mutable.HashMap.empty[(Int, String), Long]
      val snaps = Array.fill(nSnaps)(mutable.HashMap.empty[Long, String])
      val panelIds = mutable.HashSet.empty[Long]
      it.foreach { row =>
        val tag = row.getInt(0)
        if (tag < 0) cells.update((row.getInt(1), row.getString(2)),
          row.getLong(3))
        else {
          snaps(tag).update(row.getLong(4),
            if (row.isNullAt(5)) "" else row.getString(5))
          if (tag == nSnaps - 1 && row.getBoolean(6))
            panelIds += row.getLong(4)
        }
      }
      def wordsOf(text: String): Array[String] =
        LocalText.words(text.toLowerCase())
          .filter(w => LocalText.trimSpaces(w).nonEmpty)
      // Buckets memoized per DISTINCT word ([[maintainServeLocal]]'s
      // cache): three chained folds re-hash occurrences ~3x harder.
      val bucketCache = mutable.HashMap.empty[String, Array[String]]
      def bucketsOf(w: String): Array[String] =
        bucketCache.getOrElseUpdate(w, Array.tabulate(depth)(i =>
          LocalText.md5Hex(i.toString + ":" + w).substring(0, hexChars)))
      def fold(text: String, sign: Long): Unit =
        wordsOf(text).foreach { w =>
          val bs = bucketsOf(w)
          var i = 0
          while (i < depth) {
            val k = (i, bs(i))
            cells.update(k, cells.getOrElse(k, 0L) + sign)
            i += 1
          }
        }
      var k = 0
      while (k < nSnaps - 1) {
        val old = snaps(k); val neu = snaps(k + 1)
        neu.foreach { case (id, t) =>
          old.get(id) match {
            case None => fold(t, 1L) // added
            case Some(ot) =>
              // Raw equality short-circuits the hash (the
              // AdditiveCounts.maintainChainLocal discipline): equal
              // strings have equal content hashes by definition, so the
              // UNCHANGED majority pays one string compare per step and
              // only raw-differing pairs ever pay an md5.
              if (ot != t &&
                  LocalText.contentHash(ot) != LocalText.contentHash(t)) {
                fold(ot, -1L); fold(t, 1L) // changed
              }
          }
        }
        old.foreach { case (id, t) =>
          if (!neu.contains(id)) fold(t, -1L) } // removed
        k += 1
      }
      val live = cells.filter(_._2 > 0L)
      var n = 0L
      live.foreach { case ((i, _), c) => if (i == 0) n += c }
      val panel = mutable.HashSet.empty[String]
      panelIds.foreach(id => wordsOf(snaps(nSnaps - 1)(id)).foreach(panel += _))
      panel.iterator.map { w =>
        val bs = bucketsOf(w)
        var est = Long.MaxValue
        var i = 0
        while (i < depth) {
          est = math.min(est, live.getOrElse((i, bs(i)), 0L))
          i += 1
        }
        (w, est, est * 200 >= n)
      }
    }.toDF("word", "est", "is_heavy")
  }

  /** Point estimates for every item in `candidates` (one column,
    * distinct): (item, est) with est = min over the Depth rows —
    * ≥ the true count, always. The sketch side broadcasts (≤ Depth·4096
    * rows by construction). A bucket with no cell row means zero
    * increments ever hashed there, so the probe LEFT-joins and counts
    * the miss as 0 — an inner join would drop never-seen candidates
    * (contract: every candidate gets a row) and inflate estimates for
    * items with some-but-not-all empty buckets (true CMS estimate: 0). */
  def estimates(candidates: DataFrame, itemCol: String,
                cells: DataFrame): DataFrame =
    candidates
      .select(col(itemCol),
        explode(sequence(lit(0), lit(Depth - 1))).as("i"))
      .withColumn("bucket", bucketOf(col("i"), col(itemCol)))
      .join(broadcast(cells.select(col("i"), col("bucket"), col("cnt"))),
        Seq("i", "bucket"), "left")
      .groupBy(col(itemCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
}

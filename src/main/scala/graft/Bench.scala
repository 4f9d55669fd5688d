package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Prints ONE JSON line with per-query wall seconds.
  *
  * Every cell is the MIN OF TWO full measurements — the same protocol the
  * DuckDB baseline uses (BASELINE_DUCKDB.json is "min of 2 passes" in one
  * warm process), so the comparison is symmetric: the second pass reuses
  * the JVM's codegen cache exactly as DuckDB's second pass reuses its
  * compiled pipelines, and a single-sample compile/JIT artifact (a
  * 12-branch regex categorizer costs ~1 s to codegen once, 8 ms to run)
  * never lands in the reported number.
  *
  * This host's vCPU stalls can also inflate a single measurement 10-30x
  * (the same query has measured 4.8 s and 156 s with identical code), so
  * on top of min-of-2:
  *
  *   1. A fixed CANARY job (constant work, no IO) is timed between every
  *      measurement. Its cost is flat on a healthy host; a spike means the
  *      host stalled in that window, so the adjacent query cell is marked
  *      a stall suspect rather than believed.
  *   2. The second pass runs in REVERSE order — a stall window covers
  *      consecutive cells, so reversing decorrelates the two samples of
  *      any one query; the per-query min is kept (a stall never makes a
  *      query faster).
  *   3. A cell whose min is still >3 s AND whose samples were BOTH
  *      canary-flagged gets one final third sample.
  *
  * The JSON carries `canary` stats and the `stalled` list so a reader can
  * tell measurement artifacts from real regressions without re-running.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // 8 initial shuffle partitions, not `cpus`: AQE coalesces shuffle
      // OUTPUTS to the data size anyway, but the INITIAL partition count
      // still schedules that many tasks per exchange — 32 near-empty tasks
      // per stage is pure scheduler overhead on MB-scale SF inputs. On a
      // real cluster this knob scales with the data (set it per job);
      // the plans themselves are partition-count-agnostic.
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.sum

    // Canary: fixed in-memory aggregate — no parquet, no cache interaction;
    // ~100 ms healthy. Threshold is generous (5x warmed median, floor 2 s)
    // so only genuine multi-second stalls flag.
    def canaryOnce(): Double = {
      val t0 = System.nanoTime()
      try {
        spark.range(0, 2000000, 1, 4).agg(sum("id"))
          .write.format("noop").mode("overwrite").save()
      } catch { case e: Throwable => System.err.println(s"[bench] canary: $e") }
      (System.nanoTime() - t0) / 1e9
    }

    // Untimed warmup: JIT + codegen framework + parquet reader init land
    // here instead of inflating whichever query happens to run first.
    try {
      spark.read.parquet(s"$sfDir/nation.parquet")
        .groupBy("n_regionkey").count()
        .write.format("noop").mode("overwrite").save()
    } catch { case e: Throwable => System.err.println(s"[bench] warmup: $e") }
    canaryOnce(); canaryOnce() // canary's own JIT

    val canaries = scala.collection.mutable.ArrayBuffer.empty[Double]
    def canary(): Double = { val c = canaryOnce(); canaries += c; c }
    def canaryMedian: Double = {
      val s = canaries.toSeq.sorted; if (s.isEmpty) 0.1 else s(s.size / 2)
    }
    def stallThreshold: Double = math.max(2.0, canaryMedian * 5)

    // noop sink: fully executes the query (every projected column computed)
    // without count()'s column pruning, which would reduce map-shaped
    // queries to a bare scan benchmark.
    def timeOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case e: Throwable => System.err.println(s"[bench] $name: $e") }
      val dt = (System.nanoTime() - t0) / 1e9
      // drop frames persisted inside operators (LSH signature/shingle
      // caches) so later queries aren't taxed by earlier queries' memory
      spark.catalog.clearCache()
      dt
    }
    // One measurement = canary, query, canary: a stall overlapping the query
    // almost always overlaps a bracket too. Returns (seconds, flagged).
    def measure(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Boolean) = {
      val before = canary()
      val dt = timeOne(name, fn)
      val after = canary()
      (dt, math.max(before, after) > stallThreshold)
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
    val pass1 = names.map { n => n -> measure(n, SparkEntry.queries(n)) }.toMap
    // Second full pass, reverse order: a stall window that covered
    // q40..q44 in pass 1 would, re-run forward, plausibly cover them
    // again; reversed, the slow tail runs first while the window (if any)
    // sits elsewhere.
    val pass2 = names.reverse.map { n => n -> measure(n, SparkEntry.queries(n)) }.toMap

    val merged: Map[String, (Double, Boolean)] = names.map { n =>
      (pass1.get(n), pass2.get(n)) match {
        case (Some((t1, f1)), Some((t2, f2))) =>
          if (t1 <= t2) n -> (t1, f1) else n -> (t2, f2)
        case (Some(r), None) => n -> r
        case _ => n -> (Double.NaN, true)
      }
    }.toMap
    // Third sample only where both measurements are untrustworthy.
    val finalResults: Map[String, (Double, Boolean)] = names.map { n =>
      val (t, flagged) = merged(n)
      val bothFlagged = pass2.contains(n) && pass1(n)._2 && pass2(n)._2
      if (t > 3.0 && bothFlagged) {
        val (t3, f3) = measure(n, SparkEntry.queries(n))
        if (t3 < t) n -> (t3, f3) else n -> (t, flagged)
      } else n -> (t, flagged)
    }.toMap

    val qs = names.map { k => s"\"" + k + "\":" + finalResults(k)._1 }
      .mkString("{", ",", "}")
    val stalled = names.filter(finalResults(_)._2)
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = names.map(finalResults(_)._1).sum
    val cs = canaries.toSeq.sorted
    val canaryJson =
      if (cs.isEmpty) "{}"
      else s"""{"n":${cs.size},"median_sec":${cs(cs.size / 2)},"max_sec":${cs.last}}"""
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","canary":$canaryJson,"stalled":$stalled}""")
    spark.stop()
  }
}

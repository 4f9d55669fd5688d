package graft
import org.apache.spark.sql.SparkSession

/** Dev harness: time the named queries only (`runMain graft.BenchOne q40_…
  * q86_…`), same session config and noop-sink methodology as [[Bench]].
  * Iteration aid — the driver's per-round numbers come from Bench.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      // match Bench: without this the 100-entry codegen cache makes any
      // multi-query A/B time recompilation instead of the queries
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
    // Ad-hoc conf overrides for experiments: SPARK_GRAFT_CONF="k=v,k=v".
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(',').foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if k.nonEmpty => builder.config(k.trim, v.trim)
        case _ if kv.trim.isEmpty => // trailing comma etc.
        case _ => System.err.println(s"[benchone] ignoring malformed conf entry: '$kv'")
      }
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      spark.read.parquet(s"$sfDir/nation.parquet")
        .groupBy("n_regionkey").count()
        .write.format("noop").mode("overwrite").save()
    } catch { case e: Throwable => System.err.println(s"[benchone] warmup: $e") }
    args.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[benchone] unknown query: $name")
        case Some(fn) =>
          if (sys.env.contains("SPARK_GRAFT_EXPLAIN"))
            println(fn(spark, sfDir).queryExecution.executedPlan.toString.take(12000))
          if (sys.env.contains("SPARK_GRAFT_PROFILE")) {
            // Floor decomposition: DataFrame build + full Catalyst
            // planning (analysis→optimizer→physical) vs job execution.
            val t0 = System.nanoTime()
            val df =
              try { val d = fn(spark, sfDir); d.queryExecution.executedPlan; Some(d) }
              catch { case e: Throwable => System.err.println(s"[benchone] $name plan: $e"); None }
            val t1 = System.nanoTime()
            df.foreach { d =>
              try { d.write.format("noop").mode("overwrite").save() }
              catch { case e: Throwable => System.err.println(s"[benchone] $name: $e") }
            }
            val t2 = System.nanoTime()
            val phases = df.map(_.queryExecution.tracker.phases
              .map { case (k, v) => f"$k ${(v.endTimeMs - v.startTimeMs) / 1e3}%.3f" }
              .mkString(" ")).getOrElse("")
            println(f"$name%-28s plan ${(t1 - t0) / 1e9}%6.3f s  exec ${(t2 - t1) / 1e9}%6.3f s  [$phases]")
          } else {
            val t0 = System.nanoTime()
            try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
            catch { case e: Throwable => System.err.println(s"[benchone] $name: $e") }
            println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
          }
          spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}

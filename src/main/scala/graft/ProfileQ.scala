package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable.ArrayBuffer

/** Throwaway dev profiler: per-stage wall/cpu breakdown of one query. */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = ArrayBuffer[(Int, String, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        stages.synchronized {
          stages += ((si.stageId, si.name.take(60), wall,
            si.taskMetrics.executorRunTime))
        }
      }
    })
    val name = args.headOption.getOrElse("q145_incremental_corpus")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    (1 to reps).foreach { i =>
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"== rep $i: $dt%.2f s, ${stages.size} stages ==")
      if (i == reps) {
        val wallSum = stages.map(_._3).sum
        println(f"   stage wall sum ${wallSum / 1e3}%.2f s")
        stages.sortBy(_._1).take(45).foreach { case (id, n, w, r) =>
          println(f"   stage $id%4d wall ${w}%5d ms run ${r}%6d ms  $n")
        }
      }
    }
    spark.stop()
  }
}

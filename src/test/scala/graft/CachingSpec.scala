package graft

import org.apache.spark.storage.StorageLevel
import org.scalatest.concurrent.Eventually.eventually
import org.scalatest.concurrent.PatienceConfiguration.Timeout
import org.scalatest.time.{Seconds, Span}

class CachingSpec extends SparkSpec {

  private def eventuallyFreed(check: => Unit): Unit =
    eventually(Timeout(Span(10, Seconds)))(check)

  test("withCachedFrames releases scoped persists on exit; plain persists outside a scope are untouched") {
    import spark.implicits._
    val inScope = (1 to 100).toDF("x")
    // different DATA, not just a different column name: two local
    // relations with identical rows canonicalize to the same cache
    // entry, and unpersisting one would drop the shared blocks
    val outside = (1 to 200).toDF("y")
    CacheScope.scopedPersist(outside, StorageLevel.MEMORY_AND_DISK)
    outside.count()
    CacheScope.withCachedFrames {
      CacheScope.scopedPersist(inScope, StorageLevel.MEMORY_AND_DISK)
      inScope.count() // materialize inside the scope (the build's action)
      inScope.storageLevel should not be StorageLevel.NONE
    }
    inScope.storageLevel shouldBe StorageLevel.NONE
    outside.storageLevel should not be StorageLevel.NONE // session contract
    outside.unpersist()
  }

  test("withCachedFrames releases on failure too") {
    import spark.implicits._
    val df = (1 to 10).toDF("x")
    an[RuntimeException] should be thrownBy {
      CacheScope.withCachedFrames {
        CacheScope.scopedPersist(df, StorageLevel.MEMORY_AND_DISK)
        df.count()
        throw new RuntimeException("build failed")
      }
    }
    df.storageLevel shouldBe StorageLevel.NONE
  }

  // Assert on the checkpoint's OWN rdd id, never on global storage
  // state: suites share the session, and another suite's live cache
  // blocks are not this test's concern.
  private def checkpointRddId(cp: org.apache.spark.sql.DataFrame): Int =
    cp.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
    }.get

  test("releaseCheckpoint frees a superseded localCheckpoint's blocks") {
    import spark.implicits._
    val cp = (1 to 1000).toDF("x").localCheckpoint()
    val id = checkpointRddId(cp)
    spark.sparkContext.getRDDStorageInfo
      .exists(i => i.id == id && i.numCachedPartitions > 0) shouldBe true
    CacheScope.releaseCheckpoint(cp)
    eventuallyFreed {
      spark.sparkContext.getRDDStorageInfo
        .filter(i => i.id == id && i.numCachedPartitions > 0) shouldBe empty
    }
  }

  test("scoped checkpoints registered in a scope are freed on exit") {
    import spark.implicits._
    var id = -1
    CacheScope.withCachedFrames {
      val cp = (1 to 1000).toDF("x").localCheckpoint()
      id = checkpointRddId(cp)
      CacheScope.scopedCheckpoint(cp)
      cp.count()
    }
    eventuallyFreed {
      spark.sparkContext.getRDDStorageInfo
        .filter(i => i.id == id && i.numCachedPartitions > 0) shouldBe empty
    }
  }
}

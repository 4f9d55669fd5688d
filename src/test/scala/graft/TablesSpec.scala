package graft

import java.nio.file.Files

import org.apache.spark.sql.Row

/** Artifact-identity plumbing: the corpus tag is the salt every derived
  * artifact keys its scratch path with, and tags COMPOSE (a derived
  * corpus bakes its sources' tags into its dir name, and a multi-input
  * artifact concatenates several tags) — so the tag must stay bounded
  * however long the underlying dir name grows, without ever colliding
  * two distinct corpora. Round 19 found the unbounded form exceeding
  * the filesystem's 255-byte path-segment limit at the 10× scale
  * corpus (q172's two-tag artifact failed mkdir). */
class TablesSpec extends SparkSpec {

  private def mkCorpus(dirName: String): String = {
    val base = Files.createTempDirectory("tagspec").toFile.getAbsolutePath
    val dir = s"$base/$dirName"
    df("doc_id BIGINT", Seq(Row(1L))).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("short dir names keep the literal basename in the tag") {
    val dir = mkCorpus("sf0.0001x")
    val tag = Tables.corpusTag(spark, dir, "documents")
    tag should startWith("sf0.0001x_")
  }

  test("long (composed) dir names collapse to a bounded digest, distinct per corpus") {
    // two dir names that share a long prefix the way composed scale-dir
    // tags do, differing only deep inside — the digest must keep them apart
    val stem = "sf0.1_594568_1786839540587__" * 6 // ~168 chars, over the cap
    val a = mkCorpus(stem + "a")
    val b = mkCorpus(stem + "b")
    val ta = Tables.corpusTag(spark, a, "documents")
    val tb = Tables.corpusTag(spark, b, "documents")
    // bounded: digest part + bytes + mtime stays far under the 255-byte
    // segment limit even when an artifact concatenates several tags
    ta.length should be < 60
    ta should startWith("h")
    ta.takeWhile(_ != '_').length shouldBe 17 // "h" + 16 hex chars
    ta.takeWhile(_ != '_') should not be tb.takeWhile(_ != '_')
  }
}

package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.Row

import graft.SparkSpec

/** Full-reference-width silver entity (`aact_silver_layer.sql:14-362`):
  * width, the 16-branch first-match-wins categorizer (incl. shadowing
  * cases), F7 first-token semantics, and impute/cap provenance flags.
  */
class SilverWidthSpec extends SparkSpec {

  private val schema =
    "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, " +
      "o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING"

  private def orders(keys: Long*) = df(schema, keys.map(k =>
    Row(k, k * 10, "O", 1000.0 * (k + 1),
      Timestamp.valueOf("1996-03-01 00:00:00"), "1-URGENT")))

  test("projection is the full 58-column reference width") {
    Silver.fullWidthOrders(orders(1L)).columns.length shouldBe 58
  }

  test("why_stopped categorizer: branch ORDER wins over later matches") {
    val out = Silver.fullWidthOrders(orders(1L, 2L, 12L, 15L, 34L))
      .select("o_orderkey", "why_stopped_category")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // k=1: text mentions recruitment AND safety -> first branch wins
    out(1L) shouldBe "Recruitment Issues"
    // k=2: 'funding was withdrawn by the sponsor' matches branches 2, 12
    // and 16 -> Funding (branch 2) wins
    out(2L) shouldBe "Funding Issues"
    // k=12: deep branch (12 of 16) actually reachable
    out(12L) shouldBe "Sponsor Decision"
    out(15L) shouldBe "On Hold"
    // k=34: 34 % 17 = 0 -> why_stopped IS NULL -> explicit null branch
    out(34L) shouldBe "Not Stopped"
  }

  test("F7 exact form: duration_first_token is the first space-token") {
    val out = Silver.fullWidthOrders(orders(1L, 14L, 24L))
      .select("o_orderkey", "target_duration", "duration_first_token")
      .collect().map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    out(1L) shouldBe Some("1")     // "1 Weeks" -> "1"
    out(14L) shouldBe None         // 14 % 7 = 0 -> null duration -> null token
    out(24L) shouldBe Some("24")   // "24 " (empty unit) -> "24"
  }

  test("impute flags carry provenance; caps bound values") {
    val r = Silver.fullWidthOrders(orders(3L))
      .select("order_date_type", "completion_date_type", "enrollment_capped",
        "enrollment_flag", "price_capped")
      .collect().head
    r.getString(0) shouldBe "Actual"
    // k=3: completion = od + 3 days = 1996-03-04 <= asOf -> Actual
    r.getString(1) shouldBe "Actual"
    // enrollment = floor(4000/100) = 40, under cap
    r.getInt(2) shouldBe 40
    r.getString(3) shouldBe "Original"
    r.getDouble(4) shouldBe 4000.0
  }
}

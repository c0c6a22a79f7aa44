package graft

import graft.streaming.StreamJoins
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

case class Click(user: Long, click_id: Long, cts: Timestamp)
case class Purchase(user: Long, purchase_id: Long, pts: Timestamp)

/** Stream–stream interval join under real streaming execution. */
class StreamJoinsSpec extends SparkSpec {

  def t(minute: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:$sec%02d")

  test("purchase-within-10min-of-click stream-stream join") {
    val spark2 = spark
    import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[Click]
    val purchases = MemoryStream[Purchase]
    val joined = StreamJoins.followedBy(
      clicks.toDF(), purchases.toDF(), "user", "cts", "pts",
      "5 minutes", 600)
      .select(col("click_id"), col("purchase_id"))
    val q = joined.writeStream.format("memory").queryName("conv")
      .outputMode("append").start()
    try {
      clicks.addData(Click(1, 100, t(0)), Click(2, 200, t(1)))
      purchases.addData(
        Purchase(1, 900, t(5)),   // within 10 min of click 100 → match
        Purchase(2, 901, t(30)),  // 29 min after click 200 → no match
        Purchase(3, 902, t(6)))   // user with no click → no match
      q.processAllAvailable()
      // a purchase BEFORE the click never matches (strict 'after')
      clicks.addData(Click(4, 400, t(40)))
      purchases.addData(Purchase(4, 903, t(39)))
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM conv").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows === Set((100L, 900L)), rows)
    } finally q.stop()
  }

  test("same join expression works in batch mode with identical semantics") {
    val spark2 = spark
    import spark2.implicits._
    val clicks = Seq(Click(1, 100, t(0)), Click(2, 200, t(1))).toDF()
    val purchases = Seq(Purchase(1, 900, t(5)), Purchase(2, 901, t(30))).toDF()
    val rows = StreamJoins.followedBy(clicks, purchases, "user", "cts",
        "pts", "5 minutes", 600)
      .select("click_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows === Set((100L, 900L)))
  }
}

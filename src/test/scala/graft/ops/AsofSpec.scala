package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class AsofSpec extends SparkSuite {

  test("q18 as-of join: ≤ semantics, forward carry, null before first order") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("asof").toString
    // orders for user 1 at day 10 (key 100, price 10.0) and day 20 (key 200, 20.0);
    // duplicate (custkey, date) at day 20 with key 201 — max key must win
    Seq(
      (100L, 1L, ts("2024-01-10"), 10.0),
      (200L, 1L, ts("2024-01-20"), 20.0),
      (201L, 1L, ts("2024-01-20"), 21.0))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    Seq(
      (1L, ts("2024-01-05"), 1L), // before any order → null
      (2L, ts("2024-01-10"), 1L), // exactly at order date → that order (≤)
      (3L, ts("2024-01-15"), 1L), // between → day-10 order carries forward
      (4L, ts("2024-01-25"), 1L)) // after both → max-key day-20 order
      .toDF("event_id", "ts", "user_id")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = Relational.q18AsofJoin(spark, tmp).collect()
      .map(r => r.getLong(0) -> (Option(r.get(2)), Option(r.get(3)))).toMap
    assert(got(1L) == (None, None))
    assert(got(2L) == (Some(100L), Some(10.0)))
    assert(got(3L) == (Some(100L), Some(10.0)))
    assert(got(4L) == (Some(201L), Some(21.0)))
  }

  private def ts(d: String): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(d + " 00:00:00")
}

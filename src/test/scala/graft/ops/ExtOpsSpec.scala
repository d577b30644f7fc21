package graft.ops

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** ExtOps / approximate-aggregate guarantees beyond the oracle rows.
  * q40's hashed surface only pins a 10% bound (2× the sketch's default
  * 5% rsd, so it can never flake); this spec asserts the tighter error
  * actually observed at the correctness scale.
  */
class ExtOpsSpec extends SparkSuite {

  test("q40 approx_count_distinct: observed relative error <= 5% at sf0.01") {
    import spark.implicits._
    val rows = Tables.lineitem(spark, "/root/testdata/sf0.01")
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("exact"),
        approx_count_distinct($"l_partkey").as("approx"))
      .collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val (e, a) = (r.getLong(1), r.getLong(2))
      val err = math.abs(a - e).toDouble / e
      assert(err <= 0.05, s"flag=${r.getString(0)} exact=$e approx=$a err=$err")
    }
  }

  test("SecondMax UDAF: NULL on fewer than two distinct values") {
    import spark.implicits._
    val agg = ExtOps.SecondMax.toColumn
    val one = Seq(5.0, 5.0, 5.0).toDS().select(agg).head()
    assert(one == null)
    val two = Seq(5.0, 3.0, 5.0).toDS().select(agg).head()
    assert(two == 3.0)
  }
}

package graft.ops

import graft.SparkSuite

/** Semantic invariants for relational operators whose correctness gate
  * (the DuckDB oracle) could in principle be wrong in the same way on
  * both sides — asserted here from first principles instead.
  */
class RelationalSpec extends SparkSuite {

  test("q90 merge: row accounting and per-action semantics hold") {
    import spark.implicits._
    val snap = graft.Tables.orders(spark, sf0001)
      .select($"o_orderkey", $"o_totalprice").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val merged = Relational.q90MergeUpsert(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2), r.getString(3)))

    // merged = snapshot + inserts, and every snapshot key survives
    val nInserts = snap.keys.count(_ % 100 == 7)
    assert(merged.length == snap.size + nInserts)
    assert(snap.keySet.subsetOf(merged.map(_._1).toSet))

    merged.foreach { case (k, price, status, action) =>
      action match {
        case "update" =>
          assert(k % 10 == 3 && price == snap(k) * 1.1 && status == "U")
        case "insert" =>
          assert(k < 0 && status == "N" && !snap.contains(k))
          assert(price == snap(-k - 1)) // insert carries the source price
        case "keep" =>
          assert(k % 10 != 3 && price == snap(k))
        case other => fail(s"unexpected action $other")
      }
    }
    // every key ≡3 (mod 10) was in fact updated, none silently kept
    assert(merged.count(_._4 == "update") == snap.keys.count(_ % 10 == 3))
  }
}

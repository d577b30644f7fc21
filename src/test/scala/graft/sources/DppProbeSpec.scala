package graft.sources

import java.nio.file.Files

import graft.SparkSuite
import graft.tablelog.TableLog

/** End-to-end dynamic pruning through the graftlog scan: Spark's own
  * DPP machinery (broadcast-join subquery reuse) delivers the dim
  * side's key set to `SupportsRuntimeFiltering.filter`, and the
  * manifest file set shrinks BEFORE any fact task launches — the
  * q334 file-skip layers, now driven by a JOIN instead of a literal
  * predicate. Runs under default DPP confs: the dim must be a real
  * source (a LocalRelation's filter constant-folds away and Spark
  * sees no selective predicate — the probe that looks like a miss
  * but is the optimizer being right).
  */
class DppProbeSpec extends SparkSuite {
  test("broadcast-join DPP prunes graftlog files at runtime: " +
      "16 -> <=2 files for a 2-key dim, rows exact") {
    import spark.implicits._
    val t = Files.createTempDirectory("tlog_dpp_").toString
    TableLog.create((0L to 9999L).map(i => (i, s"a$i")).toDF("k", "v"),
      t, "k", 16)
    spark.conf.set("spark.sql.catalog.graftlog",
      "graft.sources.GraftLogCatalog")
    val dimDir = Files.createTempDirectory("dpp_dim_").toString + "/d"
    (0L to 9999L).map(i => (i, if (i == 5L || i == 7L) "x" else "y"))
      .toDF("dk", "note").write.parquet(dimDir)
    val q = spark.sql(s"SELECT k, v FROM graftlog.`$t`")
      .join(spark.read.parquet(dimDir).where($"note" === "x"),
        $"k" === $"dk")
    assert(q.queryExecution.optimizedPlan.toString
      .contains("dynamicpruning"), "DPP was not planned")
    val rows = q.collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq == Seq(5L, 7L))
    val finalPlan = q.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case other => other.toString
    }
    assert(finalPlan.contains("runtimePruned=true"), finalPlan.take(900))
    val m = "files=(\\d+)/16".r.findFirstMatchIn(finalPlan)
    assert(m.exists(_.group(1).toInt <= 2),
      "runtime IN-set should prune to the files holding keys 5 and 7: " +
        finalPlan.take(900))
  }

  test("DPP on a NON-key column prunes via column stats: a dim join " +
      "on a stats-indexed column shrinks the file set at runtime") {
    import spark.implicits._
    val t = Files.createTempDirectory("tlog_dppc_").toString
    // amt = k * 3 — key-ranged files give tight amt ranges per file
    TableLog.create((0L to 9999L).map(i => (i, i * 3L)).toDF("k", "amt"),
      t, "k", 16)
    spark.conf.set("spark.sql.catalog.graftlog",
      "graft.sources.GraftLogCatalog")
    val dimDir = Files.createTempDirectory("dppc_dim_").toString + "/d"
    (0L to 9999L).map(i => (i * 3L, if (i == 5L || i == 7L) "x" else "y"))
      .toDF("da", "note").write.parquet(dimDir)
    val q = spark.sql(s"SELECT k, amt FROM graftlog.`$t`")
      .join(spark.read.parquet(dimDir).where($"note" === "x"),
        $"amt" === $"da")
    assert(q.queryExecution.optimizedPlan.toString
      .contains("dynamicpruning"), "DPP was not planned on amt")
    assert(q.collect().map(_.getLong(0)).sorted.toSeq == Seq(5L, 7L))
    val finalPlan = q.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case other => other.toString
    }
    assert(finalPlan.contains("runtimePruned=true"), finalPlan.take(900))
    val m = "files=(\\d+)/16".r.findFirstMatchIn(finalPlan)
    assert(m.exists(_.group(1).toInt <= 2),
      "non-key runtime IN should prune via amt stats: " +
        finalPlan.take(900))
  }
}

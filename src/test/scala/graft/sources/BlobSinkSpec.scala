package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSuite

/** Commit-protocol guarantees of the BlobSink DSv2 connector that the
  * q379 oracle row (value fidelity) cannot see on its own. */
class BlobSinkSpec extends SparkSuite {

  private val fmt = "graft.sources.BlobSinkProvider"

  test("manifest-gated read: foreign files and orphan tmps are invisible") {
    import spark.implicits._
    val dir = Files.createTempDirectory("blobsink_gate").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").write
      .format(fmt).mode("append").option("path", dir).save()
    // plant a crashed attempt's tmp and a foreign TSV the manifest
    // never saw — both must be ignored by the read
    Files.writeString(Paths.get(dir, "part-junk.tsv.tmp"), "9\tz\n")
    Files.writeString(Paths.get(dir, "foreign.tsv"), "8\ty\n")
    val back = spark.read.format(fmt).option("path", dir).load()
      .orderBy($"id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(back.toSeq == Seq((1L, "a"), (2L, "b")))
  }

  test("append publishes atomically: second batch joins the manifest") {
    import spark.implicits._
    val dir = Files.createTempDirectory("blobsink_append").toString
    Seq((1L, "a")).toDF("id", "s").write
      .format(fmt).mode("append").option("path", dir).save()
    Seq((2L, "b")).toDF("id", "s").write
      .format(fmt).mode("append").option("path", dir).save()
    val back = spark.read.format(fmt).option("path", dir).load()
      .orderBy($"id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(back.toSeq == Seq((1L, "a"), (2L, "b")))
    // no uncommitted leftovers
    val stray = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".tmp"))
    assert(stray.isEmpty, stray.toSeq.toString)
  }

  test("round-trips NULLs, tabs, newlines, and doubles exactly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("blobsink_esc").toString
    val rows = Seq(
      (1L, Some("plain"), Some(1.5)),
      (2L, Some("tab\there\nand newline \\ backslash"), Some(-0.1)),
      (3L, None, None))
    rows.toDF("id", "s", "d").write
      .format(fmt).mode("append").option("path", dir).save()
    val back = spark.read.format(fmt).option("path", dir).load()
      .orderBy($"id").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(back.toSeq == rows)
  }
}

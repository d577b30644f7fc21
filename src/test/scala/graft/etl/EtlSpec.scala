package graft.etl

import java.nio.file.Files
import java.time.Instant
import java.util.Base64
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** ETL-fidelity e2e: the reference's extract→(missing T)→load dataflow
  * re-expressed in Spark, including its S7 list-vs-object normalization
  * and the T0 processedAt stamp the reference declared but never wrote.
  */
class EtlSpec extends SparkSuite {

  test("batch naming matches the reference convention data_%Y%m%d_%H%M%S.json") {
    assert(Extract.batchName(Instant.parse("2024-03-05T07:08:09Z"))
      == "data_20240305_070809.json")
  }

  test("e2e: land array + single-object blobs, stream-load exactly-once") {
    val root = Files.createTempDirectory("graft_etl_spec_").toString
    val landing = s"$root/landing"; val table = s"$root/table"
    val cp = s"$root/cp"

    Extract.land(() => EtlDemo.arrayPayload(3), landing,
      Instant.parse("2024-01-01T00:00:00Z"))
    Extract.land(() => EtlDemo.singleObjectPayload, landing,
      Instant.parse("2024-01-01T06:00:00Z"))

    Load.runStream(spark, landing, table, cp)
    val rows1 = Load.table(spark, table)
    assert(rows1.count() == 4) // 3 from the array + 1 from the object (S7)
    assert(rows1.filter(col("processedAt").isNull).count() == 0) // T0 stamped
    assert(rows1.filter(col("id") === 1000).select("title")
      .collect().map(_.getString(0)).toSeq == Seq("solo"))

    // re-load is a no-op (exactly-once; reference would duplicate — §2.3)
    Load.runStream(spark, landing, table, cp)
    assert(Load.table(spark, table).count() == 4)

    // a new blob is picked up incrementally
    Extract.land(() => """{"userId": 7, "id": 2000, "title": "t", "body": "b"}""",
      landing, Instant.parse("2024-01-02T00:00:00Z"))
    Load.runStream(spark, landing, table, cp)
    assert(Load.table(spark, table).count() == 5)
  }

  test("content-dedup load: a redelivered blob (same content, NEW name) adds zero rows") {
    val root = Files.createTempDirectory("graft_etl_dedup_").toString
    val landing = s"$root/landing"; val table = s"$root/table"
    val cp = s"$root/cp"
    Extract.land(() => EtlDemo.arrayPayload(3), landing,
      Instant.parse("2024-01-01T00:00:00Z"))
    Load.runStreamDeduped(spark, landing, table, cp)
    assert(Load.table(spark, table).count() == 3)
    // same CONTENT under a different blob name: the checkpoint can't
    // catch it (genuinely new file) — only the content anti-join can
    Extract.land(() => EtlDemo.arrayPayload(3), landing,
      Instant.parse("2024-01-01T06:00:00Z"))
    Load.runStreamDeduped(spark, landing, table, cp)
    assert(Load.table(spark, table).count() == 3)
    // genuinely new content still loads (and only the new rows)
    Extract.land(() => EtlDemo.arrayPayload(5), landing,
      Instant.parse("2024-01-02T00:00:00Z"))
    Load.runStreamDeduped(spark, landing, table, cp)
    assert(Load.table(spark, table).count() == 5)
    // contract read path unchanged: declared schema, fp projected away
    assert(Load.table(spark, table).schema.fieldNames.toSeq ==
      Seq("userId", "id", "title", "body", "processedAt"))
  }

  test("batch load conforms extra/missing fields to the declared contract") {
    val root = Files.createTempDirectory("graft_etl_batch_").toString
    val landing = s"$root/landing"; val table = s"$root/table"
    // extra field `junk` ignored by the declared schema; missing body → null
    Extract.land(() => """[{"userId": 1, "id": 1, "title": "a", "body": "x", "junk": 5},
                          {"userId": 2, "id": 2, "title": "b"}]""",
      landing, Instant.parse("2024-02-01T00:00:00Z"))
    Load.runBatch(spark, landing, table, lit("2024-02-01 00:00:00").cast("timestamp"))
    val rows = Load.table(spark, table).orderBy("id").collect()
    assert(rows.map(_.getAs[String]("title")).toSeq == Seq("a", "b"))
    assert(rows(1).getAs[String]("body") == null) // NULLABLE contract preserved
    assert(rows.forall(_.getAs[java.sql.Timestamp]("processedAt") != null))
    assert(Load.table(spark, table).schema.fieldNames.toSeq ==
      Seq("userId", "id", "title", "body", "processedAt"))
  }

  test("pub/sub push envelope decode (S5): base64 → {bucket, name}") {
    import scala.jdk.CollectionConverters._
    val payload = """{"bucket":"etl-bucket","name":"data_20240101_000000.json"}"""
    val b64 = Base64.getEncoder.encodeToString(payload.getBytes("UTF-8"))
    val env = s"""{"message":{"data":"$b64","messageId":"m1"}}"""
    val df = spark.read.schema(Schemas.pushEnvelope)
      .json(spark.createDataset(Seq(env))(org.apache.spark.sql.Encoders.STRING))
    val out = Transform.decodeEnvelope(df).collect()
    assert(out.length == 1)
    assert(out(0).getString(0) == "etl-bucket")
    assert(out(0).getString(1) == "data_20240101_000000.json")
  }
}

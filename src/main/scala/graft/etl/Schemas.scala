package graft.etl

import org.apache.spark.sql.types._

/** Contract schemas for the ETL-fidelity path.
  *
  * Mirrors the reference's declared-not-inferred stance: the sink
  * schema is fixed in code (reference: terraform/main.tf:68-94, all
  * NULLABLE), never inferred from data (SURVEY.md §1.3).
  */
object Schemas {

  /** A post row as fetched from the source API (reference:
    * src/extract/main.py:28 — `{userId, id, title, body}`). */
  val postsSource: StructType = StructType(Seq(
    StructField("userId", LongType, nullable = true),
    StructField("id", LongType, nullable = true),
    StructField("title", StringType, nullable = true),
    StructField("body", StringType, nullable = true),
  ))

  /** The sink table schema — source fields + `processedAt`, the column
    * the reference declares but never populates (SURVEY.md §2.1 T0);
    * our Transform stamps it. */
  val postsTable: StructType = StructType(
    postsSource.fields :+ StructField("processedAt", TimestampType, nullable = true))

  /** Pub/Sub push envelope carried to the load service (reference:
    * src/load/main.py:64-77): {"message": {"data": base64(json)}}
    * where the decoded payload is {"bucket":…, "name":…}. */
  val pushEnvelope: StructType = StructType(Seq(
    StructField("message", StructType(Seq(
      StructField("data", StringType, nullable = true),
      StructField("messageId", StringType, nullable = true),
    )), nullable = true),
  ))

  /** The decoded object-finalize payload. */
  val objectEvent: StructType = StructType(Seq(
    StructField("bucket", StringType, nullable = true),
    StructField("name", StringType, nullable = true),
  ))

  /** Typed row for Dataset[Post] where type safety helps. */
  case class Post(userId: java.lang.Long, id: java.lang.Long,
                  title: String, body: String)
}

package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** T — conform rows to the sink contract and stamp `processedAt`.
  *
  * The reference declares this stage but never implements it
  * (SURVEY.md §2.1 T0: `processedAt TIMESTAMP` exists in the BigQuery
  * schema, no code writes it). We implement the evident intent:
  * project to the contract columns and stamp ingestion time.
  */
object Transform {

  /** Conform a raw posts DataFrame to the sink schema. `processedAt`
    * is injectable for deterministic tests; production uses
    * `current_timestamp()`. */
  def conform(raw: DataFrame, processedAt: Column = current_timestamp()): DataFrame =
    raw.select(
      col("userId").cast("long").as("userId"),
      col("id").cast("long").as("id"),
      col("title").cast("string").as("title"),
      col("body").cast("string").as("body"))
      .withColumn("processedAt", processedAt.cast("timestamp"))

  /** Decode the Pub/Sub push envelope into (bucket, name) — reference
    * src/load/main.py:64-77 (S5). Kept as an explicit operator even
    * though the file source subsumes it, so the envelope contract has
    * a tested Spark expression: from_json ∘ unbase64. */
  def decodeEnvelope(envelopes: DataFrame): DataFrame =
    envelopes
      .select(from_json(
        unbase64(col("message.data")).cast("string"),
        Schemas.objectEvent).as("evt"))
      .select(col("evt.bucket").as("bucket"), col("evt.name").as("name"))
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables
  * (see /root/repo/TESTDATA.md, /root/repo/FIXTURES.md §2).
  *
  * All loads go through `spark.read.parquet` so Catalyst's vectorized
  * Parquet reader, predicate pushdown, and column pruning apply — at
  * 100 TB the scan is the dominant cost and must stay declarative.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, dir: String): DataFrame    = table(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame    = table(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame  = table(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame  = table(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame      = table(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame    = table(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame  = table(s, dir, "lineitem")
  def events(s: SparkSession, dir: String): DataFrame    = table(s, dir, "events")
  def documents(s: SparkSession, dir: String): DataFrame = table(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = table(s, dir, "embeddings")
}

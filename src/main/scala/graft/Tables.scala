package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (see FIXTURES.md).
  *
  * Every query in the engine takes `(SparkSession, sfDir)` and resolves its
  * inputs through these helpers, so the same operator graph runs unchanged at
  * sf0.001 (smoke), sf0.01 (DuckDB-oracle correctness) and sf0.1 (bench) — and,
  * by design, on a real cluster against arbitrarily large parquet directories:
  * nothing here assumes a row count, only a schema.
  *
  * Scale note (100 TB design): these are plain parquet scans, so Catalyst
  * pushes filters and prunes columns into the scan (`PushedFilters`,
  * `ReadSchema` in `.explain`); partition-level parallelism comes from
  * `spark.sql.files.maxPartitionBytes` splitting, not from anything we do here.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects ([PARQUET_TYPE_ILLEGAL]). With
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set by Verify/Bench and the
    * test sessions) the column arrives as LongType nanos; convert to
    * microsecond TIMESTAMP_NTZ here — `DIV 1000` is integer division (floor),
    * matching DuckDB's own nanos→micros truncation, and NTZ matches the
    * naive timestamps DuckDB reads, so oracle comparisons line up exactly. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", expr("CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP_NTZ)"))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}

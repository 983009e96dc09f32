package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver fixtures (TESTDATA.md / FIXTURES.md).
  *
  * Mirrors the reference's storage-engine role — the reference's intended
  * capability is holding relational tables and serving them to compute
  * engines (`/root/reference/CMakeLists.txt:103` Arrow intent; see
  * SURVEY.md §1). Here the columnar store at rest is Parquet (and the
  * custom Arrow IPC source in [[graft.sources.arrow]]); Spark's vectorized
  * reader gives columnar scan with predicate pushdown + column pruning.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.parquet stores ts as TIMESTAMP(NANOS); with
    * spark.sql.legacy.parquet.nanosAsLong=true (set by
    * [[Engine.sessionBuilder]]) it arrives as a long of epoch nanos.
    * The fixture generator only produces microsecond precision, so
    * integer-dividing to micros is lossless; `ts DIV 1000` stays in
    * long arithmetic (a double division would lose precision above
    * 2^53 ns). */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case TimestampNTZType =>
        // fixture drift: the generator may emit timestamp[us] without a
        // UTC adjustment (TIMESTAMP_NTZ). Session TZ is pinned to UTC
        // (Engine.sessionBuilder / build.sbt), so reinterpreting as an
        // instant is value-identical and matches the DuckDB oracle.
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every fixture as a temp view (the reference's table-catalog
    * role, SURVEY.md §2a R4: engine singleton holds loaded tables). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach {
      case "events" => events(spark, sfDir).createOrReplaceTempView("events")
      case n        => load(spark, sfDir, n).createOrReplaceTempView(n)
    }
}

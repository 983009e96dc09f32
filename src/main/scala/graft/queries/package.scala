package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Oracle-parity helpers shared by all declared queries.
  *
  * The driver hash-compares Spark results against DuckDB running the same
  * SQL on the same parquet (BASELINE.md). Double summation is not
  * associative, so `sum(double)` can differ in the last ulp between engines
  * (and between Spark partitionings). The fix used throughout: cast each
  * addend to an exact DECIMAL first, sum exactly, then cast the final
  * result back to double. Both engines round the *same* IEEE double to the
  * same decimal (a double never falls exactly on a half-ulp decimal
  * boundary, so half-up vs half-even tie rules never diverge), and the
  * exact-decimal → double conversion is deterministic. Every money/measure
  * aggregate below uses these helpers, mirrored literally in the oracle
  * SQL strings.
  */
package object queries {
  /** Exact sum: SUM(CAST(c AS DECIMAL(18,scale))) cast back to double.
    * SQL mirror: CAST(SUM(CAST(c AS DECIMAL(18,s))) AS DOUBLE). */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** Exact mean via exact sum / count. SQL mirror:
    * CAST(SUM(CAST(c AS DECIMAL(18,s))) AS DOUBLE) / COUNT(*). */
  def davg(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType) / count(lit(1))

  /** Round a double column for hash-stable output of genuinely
    * floating-point math (cosine similarity etc.). */
  def r(c: Column, s: Int = 4): Column = round(c, s)

  /** Spread a compute-heavy stream across all cores before per-row-heavy
    * work (N² similarity scans, shingle/word explodes, typed-imperative
    * aggregation buffers). The driver fixtures are single-row-group
    * parquet files, so their scans arrive as ONE partition and everything
    * downstream runs single-threaded until the first shuffle; at cluster
    * scale the scan is naturally thousands of splits and this round-robin
    * exchange is a cheap rebalance of the same shape Spark's AQE
    * `REBALANCE` hint performs. Only used where the downstream compute
    * dominates the exchange and outputs are partitioning-insensitive
    * (integer counts, per-row arithmetic, rounded decimals). */
  def fanOut(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** The native `might_contain` probe over a driver-built Bloom
    * sketch — what InjectRuntimeFilter plants, NOT a Scala UDF: it
    * stays inside whole-stage codegen and the serialized sketch ships
    * once as a plan literal instead of per-task via a closure. Shared
    * by the runtime-filter join (`join_bloom_prefilter`) and the
    * decontamination prefilter (`text_decontam_bloom`). */
  def bloomMightContain(spark: org.apache.spark.sql.SparkSession,
      bf: org.apache.spark.util.sketch.BloomFilter,
      probe: Column): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    org.apache.spark.sql.graft.bridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal(
          bos.toByteArray, org.apache.spark.sql.types.BinaryType),
        org.apache.spark.sql.graft.bridge.expression(spark, probe)))
  }
}

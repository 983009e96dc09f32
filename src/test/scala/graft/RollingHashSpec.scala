package graft

import graft.functions.RollingHash
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The codegen'd RollingHash expression must agree exactly with the
  * built-in composition (aggregate over split characters) it
  * accelerates, and with a JVM-side reference fold. */
class RollingHashSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def reference(s: String): Long =
    s.getBytes("UTF-8").foldLeft(7L)((a, b) => (a * 31 + (b & 0xFF)) % 1000000007L)

  test("expression == built-in composition == JVM fold, on documents") {
    RollingHash.register(spark)
    val rows = Tables.documents(spark, TestSession.Sf)
      .select(col("doc_id"), col("text"),
        expr("graft_rolling_hash(text)").as("fast"),
        TextFunctions.fingerprint(col("text")).as("composed"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (text, fast, composed) = (r.getString(1), r.getLong(2), r.getLong(3))
      assert(fast == composed, s"doc ${r.getLong(0)}")
      assert(fast == reference(text), s"doc ${r.getLong(0)} vs JVM fold")
    }
  }

  test("null input yields null") {
    RollingHash.register(spark)
    val out = spark.sql(
      "SELECT graft_rolling_hash(CAST(NULL AS STRING)) AS h").head
    assert(out.isNullAt(0))
  }
}

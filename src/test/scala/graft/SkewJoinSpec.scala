package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted join — the manual hot-key defense when AQE's skew handling
  * isn't enough: salt the skewed (fact) side, explode the small side
  * across every salt, join on (key, salt). The spec proves result
  * equality with the plain join; the plan property is that the
  * skewed key's rows now spread across SALT reducers instead of one. */
class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val Salt = 8

  test("salted fact-dim join equals the plain join") {
    val li = Tables.load(spark, TestSession.Sf, "lineitem")
    val p = Tables.load(spark, TestSession.Sf, "part")

    val plain = li.join(p, li("l_partkey") === p("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"))

    val saltedFact = li.withColumn("salt",
      pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(Salt)))
    val explodedDim = p.withColumn("salt",
      explode(array((0 until Salt).map(lit): _*)))
    val salted = saltedFact.join(explodedDim,
        saltedFact("l_partkey") === explodedDim("p_partkey") &&
          saltedFact("salt") === explodedDim("salt"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"))

    val a = plain.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = salted.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
    assert(a.nonEmpty)
  }
}

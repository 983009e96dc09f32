package graft

import graft.functions.{ShingleGenExpr, TextFunctions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native Generator (ShingleGenExpr — the UDTF leg of the custom
  * extension surface): plan shape and exact agreement with the
  * explode(shingles(...)) array formulation. */
class GeneratorSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def docs = Tables.documents(spark, TestSession.Sf)
    .select(col("doc_id"), TextFunctions.words(col("text")).as("w"))

  test("generator output equals the explode(array) formulation") {
    val viaGen = ShingleGenExpr(docs, col("w"), 3)
      .select(col("doc_id"), col("shingle"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val viaExplode = docs
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"),
        explode(TextFunctions.shingles(col("w"), 3)).as("shingle"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(viaGen == viaExplode)
    assert(viaGen.nonEmpty)
  }

  test("plans as a Generate node, rows with < k words vanish") {
    val df = ShingleGenExpr(docs, col("w"), 1000)
    assert(df.queryExecution.executedPlan.toString.contains("Generate"))
    assert(df.count() == 0)
  }

  test("property: generator equals sliding-window distinct on random word arrays") {
    import org.scalacheck.{Gen, rng}
    val vocab = Gen.oneOf("a", "bb", "ccc", "d", "", "é", "ff")
    val arrGen = Gen.listOfN(12, vocab)
    val params = Gen.Parameters.default
    val rows = (1 to 40).map { i =>
      val words = arrGen.pureApply(params, rng.Seed(i.toLong))
      (i.toLong, words)
    }
    val spark2 = spark
    import spark2.implicits._
    val df = rows.toDF("id", "w")
    for (k <- Seq(1, 2, 3, 5)) {
      val got = ShingleGenExpr(df, col("w"), k)
        .select(col("id"), col("shingle"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val expected = rows.flatMap { case (id, words) =>
        if (words.size < k) Nil
        else words.sliding(k).map(s => (id, s.mkString(" "))).toSeq.distinct
      }.toSet
      assert(got == expected, s"k=$k mismatch")
    }
  }

  test("k < 1 is rejected") {
    val e = intercept[IllegalArgumentException] {
      ShingleGenExpr(docs, col("w"), 0)
    }
    assert(e.getMessage.contains(">= 1"))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Higher-order collection lambdas over the embeddings corpus
  * (SURVEY.md §2b array family): exists / forall / filter / transform /
  * zip_with, cross-checked against scalar recomputation. transform +
  * aggregate are additionally load-bearing in TextFunctions (shingles,
  * fingerprint) and verified there by the oracle gate. */
class HigherOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def emb = Tables.embeddings(spark, TestSession.Sf)

  test("exists / forall / filter agree with driver-side recomputation") {
    val rows = emb.select(
      col("vec_id"), col("embedding"),
      exists(col("embedding"), _ > 0.5f).as("has_big"),
      forall(col("embedding"), _ > -1.0f).as("all_gt"),
      size(filter(col("embedding"), _ < 0.0f)).as("n_neg"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getSeq[Float](1)
      assert(r.getBoolean(2) == v.exists(_ > 0.5f))
      assert(r.getBoolean(3) == v.forall(_ > -1.0f))
      assert(r.getInt(4) == v.count(_ < 0.0f))
    }
  }

  test("zip_with dot product equals the codegen'd graft_dot") {
    graft.functions.DotProduct.register(spark)
    val pairs = emb.select(col("vec_id").as("a"), col("embedding").as("va"))
      .crossJoin(emb.select(col("vec_id").as("b"), col("embedding").as("vb")))
      .filter(col("a") < col("b") && col("b") < 10)
    val checked = pairs.select(
      expr("aggregate(zip_with(va, vb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)")
        .as("via_lambda"),
      expr("graft_dot(va, vb)").as("via_expr"))
      .collect()
    assert(checked.nonEmpty)
    checked.foreach(r =>
      assert(r.getDouble(0) == r.getDouble(1), s"mismatch: $r"))
  }
}

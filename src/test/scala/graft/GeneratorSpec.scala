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

  test("property: WindowHashGenExpr rolling hashes agree with the " +
      "from-scratch polynomial on random strings (incl. multi-byte), " +
      "positions stride-aligned and substring-consistent") {
    import spark.implicits._
    import graft.functions.WindowHashGenExpr
    val rnd = new scala.util.Random(90210L)
    val alphabet = "abcdef αβγ日本語" // exercises codepoint (not byte) grain
    val texts = (1L to 30L).map { id =>
      val n = rnd.nextInt(120)
      (id, (0 until n).map(_ =>
        alphabet.charAt(rnd.nextInt(alphabet.length))).mkString)
    }
    val df = texts.toDF("doc_id", "text")
    val (len, stride) = (9, 4)
    val got = WindowHashGenExpr(df, col("text"), len, stride)
      .select(col("doc_id"), col("pos"), col("h"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSet).toMap
    val B = 1000003L
    texts.foreach { case (id, s) =>
      val cps = s.codePoints().toArray
      val expect = (0 to cps.length - len by stride).map { i =>
        var h = 0L
        (i until i + len).foreach(j => h = h * B + cps(j))
        (i + 1, h)
      }.toSet
      assert(got.getOrElse(id, Set.empty) == expect, s"doc $id")
    }
    // substring-consistency: equal windows hash equal (the candidate
    // invariant the dedup confirm phase relies on)
    val byHash = got.toSeq.flatMap { case (id, ws) =>
      ws.map { case (pos, h) =>
        val cps = texts(id.toInt - 1)._2.codePoints().toArray
        (h, new String(cps, pos - 1, len))
      }
    }
    val grouped = byHash.groupBy(_._2).values
    grouped.foreach(g => assert(g.map(_._1).distinct.length == 1,
      "equal substrings must hash equal"))
  }
}

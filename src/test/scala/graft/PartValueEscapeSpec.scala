package graft

import org.scalacheck.{Gen, Prop}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.arrow.ArrowDataSource

/** Property pins for the Hive-style partition-value codec — the ONE
  * place a data value becomes part of a file path. A value that fails
  * to round-trip mis-keys every partition filter over it, and a value
  * that escapes into a path separator silently re-parents files, so
  * these hold for arbitrary strings, not a hand-picked list. */
class PartValueEscapeSpec extends AnyFunSuite {

  private def check(name: String, g: Gen[String]): Unit = {
    val prop = Prop.forAll(g) { s =>
      val esc = ArrowDataSource.escapePartValue(s)
      val back = ArrowDataSource.unescapePartValue(esc)
      // bare "." / ".." segments never occur: the directory name is
      // always "col=<escaped>", so the = prefix de-fangs them
      back == s &&
        !esc.contains('/') && !esc.contains('\\') &&
        !esc.contains('=') &&
        esc != ArrowDataSource.NullPartValue &&
        esc.forall(c => c >= ' ' && c < 127)
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default
        .withMinSuccessfulTests(500)
        .withInitialSeed(Seed(42L)), prop)
    assert(res.passed, s"$name: $res")
  }

  test("round-trip + path-safety for arbitrary unicode strings") {
    check("unicode", Gen.listOf(
      Gen.frequency(
        3 -> Gen.alphaNumChar,
        2 -> Gen.oneOf('/', '\\', '=', '%', ':', ' ', '.', '\t', '\n'),
        1 -> Gen.choose(Char.MinValue, Char.MaxValue)
          .suchThat(c => !Character.isSurrogate(c))))
      .map(_.mkString))
  }

  test("round-trip for strings that LOOK like escapes and traversals") {
    check("adversarial", Gen.oneOf(
      "%2F", "%", "%%", "%G1", "..", ".", "a/../b", "c=v", "__HIVE",
      "%2e%2e", "a%00b", "", "ends-with-%", "%2"))
  }

  test("end-to-end: a NULL key and a real sentinel-string key stay " +
      "distinct through the partitioned layout") {
    import org.apache.spark.sql.functions.col
    val spark = TestSession.spark
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("esc_sentinel").toString
    Seq((1L, ArrowDataSource.NullPartValue), (2L, null: String),
      (3L, "plain"))
      .toDF("id", "k")
      .write.format("arrow").partitionBy("k")
      .mode("overwrite").save(dir)
    val back = spark.read.format("arrow").load(dir)
    assert(back.filter(col("k").isNull).select(col("id"))
      .as[Long].collect().toSeq == Seq(2L),
      "NULL partition key lost or polluted by the sentinel string")
    assert(back.filter(col("k") === ArrowDataSource.NullPartValue)
      .select(col("id")).as[Long].collect().toSeq == Seq(1L),
      "a real value equal to the sentinel read back as NULL")
  }

  test("the null sentinel survives and never collides with a real value") {
    // a REAL string equal to the sentinel must encode differently from
    // the sentinel itself (partitionValuesOf maps the bare sentinel to
    // SQL NULL), or a user value would silently read back as NULL
    val sentinel = ArrowDataSource.NullPartValue
    val esc = ArrowDataSource.escapePartValue(sentinel)
    assert(ArrowDataSource.unescapePartValue(esc) == sentinel)
    assert(esc != sentinel,
      "escaping must distinguish a literal sentinel string from NULL")
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Soundness property for every planning-time skip the Arrow source
  * performs — zone-map batch pruning, whole-file pruning, per-file
  * Bloom skips, partition pruning, and the pushed-filter residual:
  * for RANDOM predicates over data with nulls and boundary values, the
  * pruned scan must return exactly the rows the same predicate keeps
  * over the unpruned in-memory data. Pruning that drops a matching row
  * is silent data loss; this spec hunts it with a generator instead of
  * a hand-picked list. */
class PruningSoundnessSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  // fixture: longs with extremes, strings with nulls, floats with
  // negatives — written with small batches (many zone-map units),
  // a bloom on the string column, and a partition column
  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files
      .createTempDirectory("prune_sound").toString
    val rows = (0 until 2000).map { i =>
      val k = i match {
        case 0 => Long.MinValue + 1
        case 1 => Long.MaxValue
        case _ => (i * 37 % 500).toLong
      }
      val s = if (i % 11 == 0) null else s"s${i % 63}"
      val f = (i % 97) * (if (i % 2 == 0) 1.5f else -0.75f)
      (k, s, f, s"p${i % 3}")
    }
    rows.toDF("k", "s", "f", "p")
      .repartition(4)
      .write.format("arrow")
      .option("batchRows", "64")
      .option("bloomFilterColumns", "s")
      .partitionBy("p")
      .mode("overwrite").save(d)
    d
  }
  private lazy val truth: DataFrame = {
    val df = spark.read.format("arrow").load(dir)
      .persist() // ground truth materialized once, no pruning applied
    df.count()
    df
  }

  // predicates generated as SQL text: one grammar drives both the
  // DataFrame filter (expr(...)) and the SQL DELETE statement
  private def leafGen: Gen[String] = Gen.oneOf(
    Gen.choose(-10L, 510L).map(c => s"k < $c"),
    Gen.choose(-10L, 510L).map(c => s"k >= $c"),
    Gen.listOfN(3, Gen.choose(0L, 500L)).map(vs =>
      s"k IN (${vs.mkString(", ")})"),
    Gen.choose(0, 70).map(v => s"s = 's$v'"),
    Gen.listOfN(2, Gen.choose(0, 70)).map(vs =>
      s"s IN (${vs.map(v => s"'s$v'").mkString(", ")})"),
    Gen.const("s IS NULL"),
    Gen.const("s IS NOT NULL"),
    // string zone-map leaves: range + prefix in UTF-8 byte order
    Gen.choose(0, 70).map(v => s"s < 's$v'"),
    Gen.choose(0, 70).map(v => s"s >= 's$v'"),
    Gen.choose(0, 6).map(v => s"s LIKE 's$v%'"),
    Gen.choose(-80, 80).map(c => s"f > $c"),
    Gen.oneOf(0, 1, 2).map(v => s"p = 'p$v'"),
    Gen.oneOf(0, 1, 2).map(v => s"p != 'p$v'"),
    Gen.const(s"k = ${Long.MaxValue}L"))

  private def predGen: Gen[String] = for {
    a <- leafGen; b <- leafGen; c <- leafGen
    shape <- Gen.choose(0, 3)
  } yield shape match {
    case 0 => a
    case 1 => s"($a) AND ($b)"
    case 2 => s"($a) OR ($b)"
    case 3 => s"(($a) AND ($b)) OR ($c)"
  }

  test("12 random DELETE predicates: remaining rows equal the " +
      "three-valued complement, whatever path the predicate takes " +
      "(metadata-only, CoW triage, or the row-level rewrite)") {
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.arrow.GraftCatalog].getName)
    val params = Gen.Parameters.default
    var seed = Seed(987L)
    val base = truth.collect().map(_.toString).toSet
    for (i <- 1 to 12) {
      val p = predGen.pureApply(params, seed)
      seed = seed.next
      val d = java.nio.file.Files
        .createTempDirectory(s"prune_del_$i").toString
      truth.write.format("arrow")
        .option("batchRows", "64").partitionBy("p")
        .mode("overwrite").save(d)
      graft.sources.arrow.ArrowDataSource.initTableLog(d)
      // odd iterations run merge-on-read: deletes become deletion
      // vectors the reader masks, a wholly different execution path
      // that must keep identical semantics
      if (i % 2 == 1)
        graft.sources.arrow.ArrowDataSource.setDeletionVectors(d, true)
      // DELETE removes rows where p is TRUE; survivors are the rows
      // where p is FALSE **or NULL** (SQL three-valued semantics)
      val expected = base -- truth.filter(expr(p)).collect()
        .map(_.toString)
      spark.sql(s"DELETE FROM graft.arrow.`$d` WHERE $p")
      val got = spark.read.format("arrow").load(d)
        .collect().map(_.toString).toSet
      assert(got == expected,
        s"DELETE #$i ($p, dv=${i % 2 == 1}) diverged: " +
          s"resurrected=${(got -- expected).take(3)} " +
          s"lost=${(expected -- got).take(3)}")
    }
  }

  test("10 random UPDATE predicates: the rewritten table equals the " +
      "row-wise expectation, on copy-on-write AND merge-on-read paths") {
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.arrow.GraftCatalog].getName)
    val params = Gen.Parameters.default
    var seed = Seed(555L)
    for (i <- 1 to 10) {
      val p = predGen.pureApply(params, seed)
      seed = seed.next
      val d = java.nio.file.Files
        .createTempDirectory(s"prune_upd_$i").toString
      truth.write.format("arrow")
        .option("batchRows", "64").partitionBy("p")
        .mode("overwrite").save(d)
      graft.sources.arrow.ArrowDataSource.initTableLog(d)
      if (i % 2 == 1)
        graft.sources.arrow.ArrowDataSource.setDeletionVectors(d, true)
      // matched rows double f and null s; everything else unchanged
      val expected = truth
        .withColumn("hit", expr(p) <=> lit(true))
        .select(col("k"),
          when(col("hit"), lit(null: String)).otherwise(col("s")).as("s"),
          when(col("hit"), col("f") * 2).otherwise(col("f")).as("f"),
          col("p"))
        .collect().map(_.toString).sorted.toSeq
      spark.sql(s"UPDATE graft.arrow.`$d` " +
        s"SET f = f * CAST(2 AS FLOAT), s = NULL WHERE $p")
      val got = spark.read.format("arrow").load(d)
        .select(col("k"), col("s"), col("f"), col("p"))
        .collect().map(_.toString).sorted.toSeq
      assert(got == expected,
        s"UPDATE #$i ($p, dv=${i % 2 == 1}) diverged: " +
          s"missing=${expected.diff(got).take(3)} " +
          s"extra=${got.diff(expected).take(3)}")
    }
  }

  test("pushed global aggregates answer from footer stats exactly — " +
      "including over a deletion-vector-masked table") {
    // MIN/MAX/COUNT pushdown serves results from metadata; any
    // divergence from the row-wise computation is silent wrongness.
    def aggRow(df: DataFrame) = df.agg(
      min(col("k")), max(col("k")), count(lit(1)),
      count(col("s")), min(col("f")), max(col("f"))).collect()(0)
    val expected = aggRow(truth)
    val got = aggRow(spark.read.format("arrow").load(dir))
    assert(got == expected, s"pushed agg diverged: $got vs $expected")
    // now with rows masked by deletion vectors: pushdown must either
    // adjust exactly or fall back to scanning — never overcount
    val d = java.nio.file.Files
      .createTempDirectory("prune_agg_dv").toString
    truth.write.format("arrow").option("batchRows", "64")
      .mode("overwrite").save(d)
    graft.sources.arrow.ArrowDataSource.initTableLog(d)
    graft.sources.arrow.ArrowDataSource.setDeletionVectors(d, true)
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.arrow.GraftCatalog].getName)
    spark.sql(s"DELETE FROM graft.arrow.`$d` WHERE k >= 400 OR s IS NULL")
    val expectedDv = aggRow(
      truth.filter(!(col("k") >= 400 || col("s").isNull) <=> lit(true)))
    val gotDv = aggRow(spark.read.format("arrow").load(d))
    assert(gotDv == expectedDv,
      s"pushed agg over DV table diverged: $gotDv vs $expectedDv")
  }

  test("200 random predicates: the pruned arrow scan returns exactly " +
      "the unpruned rows — no skip ever drops a matching row") {
    val params = Gen.Parameters.default
    var seed = Seed(1234L)
    for (i <- 1 to 200) {
      val p = predGen.pureApply(params, seed)
      seed = seed.next
      val expected = truth.filter(expr(p))
        .collect().map(_.toString).sorted.toSeq
      val got = spark.read.format("arrow").load(dir).filter(expr(p))
        .collect().map(_.toString).sorted.toSeq
      assert(got == expected,
        s"predicate #$i ($p) diverged: pruned scan returned " +
          s"${got.size} rows vs ${expected.size} expected; " +
          s"missing=${expected.diff(got).take(3)} " +
          s"extra=${got.diff(expected).take(3)}")
    }
  }
}

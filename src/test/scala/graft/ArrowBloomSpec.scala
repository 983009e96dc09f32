package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.arrow.{ArrowBloom, ArrowDataSource}

/** Per-file Bloom filters: point predicates on high-cardinality
  * columns skip whole files at planning time (zone maps cannot — the
  * min/max range spans the domain), results stay exact, and an absent
  * bloom never changes behavior. */
class ArrowBloomSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private def tmpDir(): String =
    Files.createTempDirectory("arrow_bloom").toString

  test("bloom bits prove absence and never false-negative") {
    val bits = ArrowBloom.emptyBits()
    val dt = org.apache.spark.sql.types.StringType
    val present = (0 until 5000).map(i => s"host-$i.example")
    present.foreach(v => ArrowBloom.add(bits, dt, v))
    // no false negatives, by construction
    assert(present.forall(v => ArrowBloom.mightContain(bits, dt, v)))
    // false-positive rate stays near the designed ~1% at this load
    val absent = (0 until 5000).map(i => s"absent-$i.example")
    val fp = absent.count(v => ArrowBloom.mightContain(bits, dt, v))
    assert(fp < 250, s"false-positive rate ${fp / 5000.0} too high")
    // round-trips through the footer encoding
    val decoded = ArrowBloom.decode(ArrowBloom.encode(bits)).get
    assert(decoded.sameElements(bits))
  }

  test("point lookups skip whole files; answers stay exact") {
    val dir = tmpDir()
    // several files (one per shuffle partition), each covering the full
    // o_custkey RANGE (hash-distributed) so zone maps can prune nothing
    Tables.load(spark, TestSession.Sf, "orders")
      .repartition(8, col("o_orderkey"))
      .write.format("arrow")
      .option("bloomFilterColumns", "o_custkey")
      .mode("overwrite").save(dir)
    val files = ArrowDataSource.visibleIpcFiles(dir)
    assert(files.length >= 4)
    assert(files.forall(f =>
      ArrowDataSource.footerInfo(f).blooms.contains("o_custkey")),
      "writer recorded no blooms")

    def parts(df: org.apache.spark.sql.DataFrame) = df.rdd.getNumPartitions
    val all = spark.read.format("arrow").load(dir)
    // a value that exists nowhere: every file's bloom proves absence
    val missing = all.filter(col("o_custkey") === -424242L)
    assert(parts(missing) == 0,
      s"bloom pruned nothing: ${parts(missing)} of ${parts(all)}")
    assert(missing.count() == 0)
    // a value that exists: exact rows, and only the containing files
    // (plus ~1% false positives) are planned
    val probe = Tables.load(spark, TestSession.Sf, "orders")
      .select("o_custkey").head.getLong(0)
    val hit = all.filter(col("o_custkey") === probe)
    val expected = Tables.load(spark, TestSession.Sf, "orders")
      .filter(col("o_custkey") === probe)
    assert(hit.count() == expected.count() && expected.count() > 0)
    // IN with all-absent probes also prunes; mixed IN keeps the hits
    val absentIn = all.filter(col("o_custkey").isin(-1L, -2L, -3L))
    assert(parts(absentIn) == 0 && absentIn.count() == 0)
    val mixedIn = all.filter(col("o_custkey").isin(probe, -424242L))
    assert(mixedIn.count() == expected.count())
  }

  test("a directory without blooms is unaffected") {
    val dir = tmpDir()
    Tables.load(spark, TestSession.Sf, "region")
      .write.format("arrow").mode("overwrite").save(dir)
    val df = spark.read.format("arrow").load(dir)
      .filter(col("r_regionkey") === 1L)
    assert(df.count() == 1)
  }
}

package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.arrow.{ArrowDataSource, GraftCatalog}

/** Partition-level DELETE on the Arrow source: a predicate over
  * partition columns selects whole value directories exactly, so the
  * delete is a planning-time file removal — no rewrite, no scan.
  * Data-column predicates are refused loudly (no silent rewriting);
  * streaming-sink directories are refused (a delete would desync the
  * commit log). */
class ArrowDeleteSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSession.spark
    s.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    s
  }

  private def partitionedDir(): String = {
    val dir = Files.createTempDirectory("arrow_del").toString
    Tables.load(spark, TestSession.Sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .write.format("arrow").partitionBy("o_orderstatus")
      .mode("overwrite").save(dir)
    dir
  }

  test("DELETE WHERE partition = value removes exactly that partition") {
    val dir = partitionedDir()
    val orders = Tables.load(spark, TestSession.Sf, "orders")
    spark.sql(s"DELETE FROM graft.arrow.`$dir` WHERE o_orderstatus = 'F'")
    val back = spark.read.format("arrow").load(dir)
    assert(back.filter(col("o_orderstatus") === "F").count() == 0)
    assert(back.count() ==
      orders.filter(col("o_orderstatus") =!= "F").count())
    // the value directory itself is swept away, not left empty
    assert(!Files.exists(Paths.get(dir, "o_orderstatus=F")),
      "empty partition directory must be removed")
    // remaining data is untouched row-for-row
    val expect = orders.filter(col("o_orderstatus") =!= "F")
      .agg(sum(col("o_orderkey"))).collect()(0).getLong(0)
    assert(back.agg(sum(col("o_orderkey"))).collect()(0).getLong(0)
      == expect)
  }

  test("DELETE on an IN-list of partitions composes") {
    val dir = partitionedDir()
    spark.sql(
      s"DELETE FROM graft.arrow.`$dir` WHERE o_orderstatus IN ('F','P')")
    val back = spark.read.format("arrow").load(dir)
    assert(back.select(col("o_orderstatus")).distinct().collect()
      .map(_.getString(0)).toSeq == Seq("O"))
  }

  test("a data-column predicate is refused, not silently rewritten") {
    val dir = partitionedDir()
    val before = spark.read.format("arrow").load(dir).count()
    val e = intercept[Exception] {
      spark.sql(s"DELETE FROM graft.arrow.`$dir` WHERE o_orderkey < 100")
    }
    assert(e.getMessage != null)
    assert(spark.read.format("arrow").load(dir).count() == before,
      "refused delete must not remove anything")
  }

  test("a streaming-sink directory refuses DELETE (commit-log desync)") {
    val dir = Files.createTempDirectory("arrow_del_sink").toString
    val stage = Files.createTempDirectory("arrow_del_stage").toString
    Tables.load(spark, TestSession.Sf, "region")
      .write.format("arrow").mode("overwrite").save(stage)
    val moved = ArrowDataSource.listIpcFiles(stage).zipWithIndex.map {
      case (f, i) =>
        val dest = Paths.get(dir, s"part-e0-$i.arrow")
        Files.move(f, dest); dest.toString
    }
    ArrowDataSource.commitEpochManifest(dir, 0L, moved)
    val before = spark.read.format("arrow").load(dir).count()
    assert(before > 0)
    // SQL path: refused (flat sink has no partition columns to match)
    intercept[Exception] {
      spark.sql(s"DELETE FROM graft.arrow.`$dir` WHERE r_regionkey = 0")
    }
    assert(spark.read.format("arrow").load(dir).count() == before)
    // the commit-log guard itself: even an unconditioned delete (which
    // canDeleteWhere would accept) must refuse on a sink directory
    val tbl = new graft.sources.arrow.ArrowTable(
      spark.read.format("arrow").load(dir).schema,
      Map("path" -> dir))
    val e = intercept[UnsupportedOperationException] {
      tbl.deleteWhere(
        Array.empty[org.apache.spark.sql.sources.Filter])
    }
    assert(e.getMessage.contains("commit log"), e.getMessage)
    assert(spark.read.format("arrow").load(dir).count() == before)
  }
}

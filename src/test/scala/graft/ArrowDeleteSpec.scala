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
    // partition-only DELETE is METADATA-ONLY: the files stay on disk
    // (backing VERSION AS OF) but leave the visible set atomically;
    // vacuum then reclaims the bytes and sweeps the empty directory
    assert(Files.exists(Paths.get(dir, "o_orderstatus=F")),
      "metadata delete must not touch data bytes")
    graft.sources.arrow.ArrowOptimize.vacuum(dir, graceMs = 0)
    assert(!Files.exists(Paths.get(dir, "o_orderstatus=F")),
      "vacuum reclaims the deleted partition and sweeps its directory")
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

  test("data-column DELETE is copy-on-write and touches only " +
      "zone-map-overlapping files") {
    val dir = Files.createTempDirectory("arrow_del_cow").toString
    val orders = Tables.load(spark, TestSession.Sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    // range-disjoint files: each file's o_orderkey zone map covers a
    // distinct slice, so a low-key delete can prove 3 of 4 files clean
    orders.repartitionByRange(4, col("o_orderkey"))
      .sortWithinPartitions(col("o_orderkey"))
      .write.format("arrow").mode("overwrite").save(dir)
    val before = ArrowDataSource.listIpcFiles(dir).map(_.toString).toSet
    assert(before.size == 4)
    val maxKey = orders.agg(max(col("o_orderkey"))).collect()(0).getLong(0)
    val cut = maxKey / 8 // well inside the first range slice
    spark.sql(s"DELETE FROM graft.arrow.`$dir` WHERE o_orderkey <= $cut")
    val visible = ArrowDataSource.visibleIpcFiles(dir)
      .map(_.toString).toSet
    // copy-on-write: non-overlapping files are never rewritten (a
    // rewrite lands under a fresh uuid name, so identity = untouched)
    assert((before & visible).size >= 3,
      s"too many files rewritten:\nbefore=$before\nvisible=$visible")
    assert(visible.size == 4, "one overlapping file swapped for its rewrite")
    // the replaced original stays ON DISK behind the log for VERSION
    // AS OF — 4 originals + 1 replacement until vacuum
    assert(ArrowDataSource.listIpcFiles(dir).size == 5,
      "replaced file must survive on disk until vacuum")
    // and the rows are exactly SQL's semantics
    val back = spark.read.format("arrow").load(dir)
    val expect = orders.filter(col("o_orderkey") > cut)
    assert(back.count() == expect.count())
    assert(back.agg(sum(col("o_orderkey"))).collect()(0).getLong(0) ==
      expect.agg(sum(col("o_orderkey"))).collect()(0).getLong(0))
  }

  test("DELETE mixing partition and data predicates rewrites only " +
      "inside the selected partition") {
    val dir = partitionedDir()
    val orders = Tables.load(spark, TestSession.Sf, "orders")
    val othersBefore = ArrowDataSource.listIpcFiles(dir)
      .filterNot(_.toString.contains("o_orderstatus=F")).map(_.toString).toSet
    spark.sql(s"DELETE FROM graft.arrow.`$dir` " +
      "WHERE o_orderstatus = 'F' AND o_totalprice > 150000.0")
    val othersAfter = ArrowDataSource.listIpcFiles(dir)
      .filterNot(_.toString.contains("o_orderstatus=F")).map(_.toString).toSet
    assert(othersBefore == othersAfter,
      "files outside the partition predicate must be untouched")
    val back = spark.read.format("arrow").load(dir)
    val expect = orders.filter(!(col("o_orderstatus") === "F" &&
      col("o_totalprice") > 150000.0))
    assert(back.count() == expect.count())
  }

  test("rows where the DELETE predicate is NULL survive (SQL " +
      "three-valued semantics)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("arrow_del_null").toString
    Seq((1L, Some("a")), (2L, Some("b")), (3L, None), (4L, Some("a")))
      .toDF("id", "tag")
      .write.format("arrow").mode("overwrite").save(dir)
    spark.sql(s"DELETE FROM graft.arrow.`$dir` WHERE tag = 'a'")
    val back = spark.read.format("arrow").load(dir)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(back == Set((2L, Some("b")), (3L, None)),
      s"NULL-tag row must survive a `tag = 'a'` delete, got $back")
  }

  test("a file whose every row matches leaves the visible set with " +
      "no replacement; vacuum sweeps the emptied partition") {
    val dir = partitionedDir()
    // data conjunct forces the copy-on-write path; it matches every
    // row, so the F partition's files are removed without replacements
    spark.sql(s"DELETE FROM graft.arrow.`$dir` " +
      "WHERE o_orderstatus = 'F' AND o_totalprice > 0.0")
    val back = spark.read.format("arrow").load(dir)
    assert(back.filter(col("o_orderstatus") === "F").count() == 0)
    graft.sources.arrow.ArrowOptimize.vacuum(dir, graceMs = 0)
    assert(!Files.exists(Paths.get(dir, "o_orderstatus=F")),
      "vacuum must sweep the emptied partition directory")
  }

  test("copy-on-write preserves bucket stamps and the codec") {
    val dir = Files.createTempDirectory("arrow_del_bucket").toString
    Tables.load(spark, TestSession.Sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
      .write.format("arrow").option("bucketBy", "o_custkey")
      .option("numBuckets", "4").option("codec", "zstd")
      .mode("overwrite").save(dir)
    spark.sql(s"DELETE FROM graft.arrow.`$dir` WHERE o_orderkey <= 1000")
    val infos = ArrowDataSource.listIpcFiles(dir)
      .map(ArrowDataSource.footerInfo)
    assert(infos.nonEmpty)
    assert(infos.forall(_.bucket.exists(_._1 == "o_custkey")),
      "bucket stamps must survive the rewrite")
    assert(infos.forall(_.codec.contains("zstd")),
      "codec stamp must survive the rewrite")
  }

  test("an untranslatable predicate flows through the group-based " +
      "CoW rewrite and stays exact") {
    // FilterEval cannot claim `pmod(...)`, so SupportsDelete refuses —
    // but the table's SupportsRowLevelOperations contract
    // (ArrowRowLevelSpec) picks it up as a ReplaceData rewrite with
    // Spark evaluating the predicate, instead of erroring out.
    val dir = partitionedDir()
    val orders = Tables.load(spark, TestSession.Sf, "orders")
    spark.sql(s"DELETE FROM graft.arrow.`$dir` " +
      "WHERE pmod(o_orderkey, 2) = 0")
    val back = spark.read.format("arrow").load(dir)
    assert(back.filter(pmod(col("o_orderkey"), lit(2)) === 0).count()
      == 0, "every even key deleted")
    assert(back.count() ==
      orders.filter(pmod(col("o_orderkey"), lit(2)) === 1).count(),
      "every odd key survives")
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

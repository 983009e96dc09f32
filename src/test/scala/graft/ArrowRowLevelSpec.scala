package graft

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.arrow.GraftCatalog

/** Group-based copy-on-write row-level operations through Spark SQL:
  * UPDATE, MERGE INTO, and residual DELETE rewrite only the files that
  * hold matching rows (footer-stat triage + runtime group filtering on
  * `_file`); every other file keeps its exact bytes. Bucketed layouts
  * and streaming sinks refuse rather than corrupt their contracts. */
class ArrowRowLevelSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSession.spark
    s.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    s
  }

  /** Range-sorted flat layout: 4 files with disjoint o_orderkey
    * slices, so a low-key predicate provably skips the upper files. */
  private def rangedDir(): String = {
    val dir = Files.createTempDirectory("arrow_rlo").toString
    Tables.load(spark, TestSession.Sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .repartitionByRange(4, col("o_orderkey"))
      .sortWithinPartitions(col("o_orderkey"))
      .write.format("arrow").mode("overwrite").save(dir)
    dir
  }

  private def files(dir: String): Map[Path, java.time.Instant] = {
    val s = Files.list(Paths.get(dir))
    try s.iterator().asScala
      .filter(_.toString.endsWith(".arrow"))
      .map(p => p -> Files.getLastModifiedTime(p).toInstant).toMap
    finally s.close()
  }

  test("SQL UPDATE rewrites matching rows, carries the rest") {
    val dir = rangedDir()
    val before = spark.read.format("arrow").load(dir)
      .agg(sum(col("o_totalprice")).cast("decimal(18,2)")).collect()(0)
    spark.sql(s"UPDATE graft.arrow.`$dir` SET o_totalprice = 0.0 " +
      "WHERE o_orderkey <= 1000")
    val back = spark.read.format("arrow").load(dir)
    assert(back.filter(col("o_orderkey") <= 1000)
      .filter(col("o_totalprice") =!= 0.0).count() == 0,
      "every matching row updated")
    val orders = Tables.load(spark, TestSession.Sf, "orders")
    assert(back.count() == orders.count(), "no rows gained or lost")
    val expect = orders.filter(col("o_orderkey") > 1000)
      .agg(sum(col("o_totalprice")).cast("decimal(18,2)")).collect()(0)
    assert(back.agg(sum(col("o_totalprice")).cast("decimal(18,2)"))
      .collect()(0) == expect, "non-matching values carried verbatim")
    assert(before != expect)
  }

  test("UPDATE touches only files whose stats overlap the predicate") {
    val dir = rangedDir()
    val before = files(dir)
    assert(before.size == 4)
    spark.sql(s"UPDATE graft.arrow.`$dir` SET o_totalprice = 1.0 " +
      "WHERE o_orderkey <= 100")
    // the VISIBLE set keeps the 3 non-overlapping originals and swaps
    // only the low-range file for its rewrite
    val visible = graft.sources.arrow.ArrowDataSource
      .visibleIpcFiles(dir).toSet
    assert((before.keySet & visible).size == 3,
      s"3 of 4 range files out of [0,100] must stay visible untouched, " +
        s"kept ${(before.keySet & visible).size}")
    assert(visible.size == 4)
    // the replaced original keeps its bytes ON DISK (it backs
    // VERSION AS OF until vacuum), so the directory holds 4 + 1 files
    assert(files(dir).size == 5,
      "replaced file must survive on disk for time travel")
  }

  test("UPDATE routes rewritten rows back into their partitions") {
    val dir = Files.createTempDirectory("arrow_rlo_part").toString
    Tables.load(spark, TestSession.Sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .write.format("arrow").partitionBy("o_orderstatus")
      .mode("overwrite").save(dir)
    spark.sql(s"UPDATE graft.arrow.`$dir` SET o_totalprice = 0.0 " +
      "WHERE o_orderstatus = 'F' AND o_orderkey <= 500")
    val back = spark.read.format("arrow").load(dir)
    val orders = Tables.load(spark, TestSession.Sf, "orders")
    assert(back.count() == orders.count())
    assert(back.filter(col("o_orderstatus") === "F")
      .filter(col("o_orderkey") <= 500)
      .filter(col("o_totalprice") =!= 0.0).count() == 0)
    // untouched partitions keep their value sums exactly
    val expect = orders.filter(col("o_orderstatus") === "O")
      .agg(sum(col("o_totalprice")).cast("decimal(18,2)")).collect()(0)
    assert(back.filter(col("o_orderstatus") === "O")
      .agg(sum(col("o_totalprice")).cast("decimal(18,2)"))
      .collect()(0) == expect)
  }

  test("UPDATE on a partition column moves rows to their new value " +
      "directory") {
    val dir = Files.createTempDirectory("arrow_rlo_move").toString
    Tables.load(spark, TestSession.Sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .write.format("arrow").partitionBy("o_orderstatus")
      .mode("overwrite").save(dir)
    val wasF = spark.read.format("arrow").load(dir)
      .filter(col("o_orderstatus") === "F").count()
    assert(wasF > 0)
    spark.sql(s"UPDATE graft.arrow.`$dir` SET o_orderstatus = 'X' " +
      "WHERE o_orderstatus = 'F'")
    val back = spark.read.format("arrow").load(dir)
    assert(back.filter(col("o_orderstatus") === "F").count() == 0)
    assert(back.filter(col("o_orderstatus") === "X").count() == wasF,
      "rewritten rows land under the new value directory")
    assert(Files.exists(Paths.get(dir, "o_orderstatus=X")))
    // the emptied value directory keeps its (now invisible) files for
    // VERSION AS OF; vacuum reclaims them and sweeps the directory
    assert(Files.exists(Paths.get(dir, "o_orderstatus=F")),
      "replaced partition files back time travel until vacuum")
    graft.sources.arrow.ArrowOptimize.vacuum(dir, graceMs = 0)
    assert(!Files.exists(Paths.get(dir, "o_orderstatus=F")),
      "vacuum sweeps the emptied value directory")
  }

  test("MERGE INTO updates matches and inserts the rest") {
    val dir = rangedDir()
    val src = spark.range(1, 11).selectExpr(
      "id * 1000 AS k", "cast(id AS double) AS p")
    src.createOrReplaceTempView("rlo_merge_src")
    spark.sql(
      s"""MERGE INTO graft.arrow.`$dir` t
         |USING rlo_merge_src s ON t.o_orderkey = s.k
         |WHEN MATCHED THEN UPDATE SET o_totalprice = s.p
         |WHEN NOT MATCHED THEN
         |  INSERT (o_orderkey, o_totalprice, o_orderstatus)
         |  VALUES (s.k, s.p, 'M')""".stripMargin)
    val back = spark.read.format("arrow").load(dir)
    val orders = Tables.load(spark, TestSession.Sf, "orders")
    val existing = orders.join(src, col("o_orderkey") === col("k"))
      .count()
    assert(back.count() == orders.count() + (10 - existing),
      "merged row count = old + inserted")
    // every source key now carries the source price
    val merged = back.join(src, col("o_orderkey") === col("k"))
      .filter(col("o_totalprice") =!= col("p")).count()
    assert(merged == 0, "matched rows updated, unmatched inserted")
    assert(back.filter(col("o_orderstatus") === "M").count() ==
      10 - existing)
  }

  test("MERGE with WHEN NOT MATCHED BY SOURCE DELETE prunes the " +
      "target to the source") {
    val dir = rangedDir()
    val orders = Tables.load(spark, TestSession.Sf, "orders")
    spark.range(1, 501).selectExpr("id AS k")
      .createOrReplaceTempView("rlo_nmbs_src")
    spark.sql(
      s"""MERGE INTO graft.arrow.`$dir` t
         |USING rlo_nmbs_src s ON t.o_orderkey = s.k
         |WHEN MATCHED THEN UPDATE SET o_totalprice = 0.0
         |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    val back = spark.read.format("arrow").load(dir)
    val expectKept = orders.filter(col("o_orderkey").between(1, 500))
    assert(back.count() == expectKept.count(),
      "rows outside the source are deleted")
    assert(back.filter(col("o_totalprice") =!= 0.0).count() == 0,
      "every surviving row took the matched update")
  }

  test("UPDATE with a subquery predicate full-rewrites correctly " +
      "(group filter cannot fire)") {
    val dir = rangedDir()
    val orders = Tables.load(spark, TestSession.Sf, "orders")
    spark.sql(
      s"""UPDATE graft.arrow.`$dir` SET o_totalprice = -1.0
         |WHERE o_orderkey IN (
         |  SELECT o_orderkey FROM graft.arrow.`$dir`
         |  WHERE o_orderstatus = 'F')""".stripMargin)
    val back = spark.read.format("arrow").load(dir)
    assert(back.count() == orders.count())
    assert(back.filter(col("o_orderstatus") === "F")
      .filter(col("o_totalprice") =!= -1.0).count() == 0)
    assert(back.filter(col("o_orderstatus") =!= "F")
      .filter(col("o_totalprice") === -1.0).count() == 0,
      "rows outside the subquery keep their prices")
  }

  test("DELETE with a NOT predicate goes copy-on-write via ReplaceData") {
    val dir = rangedDir()
    // FilterEval refuses NOT, so SupportsDelete cannot claim this —
    // it must flow through the group-based rewrite and still be exact
    spark.sql(s"DELETE FROM graft.arrow.`$dir` " +
      "WHERE NOT (o_orderkey > 1000)")
    val back = spark.read.format("arrow").load(dir)
    val orders = Tables.load(spark, TestSession.Sf, "orders")
    assert(back.count() == orders.filter(col("o_orderkey") > 1000).count())
    assert(back.agg(min(col("o_orderkey"))).collect()(0).getLong(0) > 1000)
  }

  test("CoW DELETE keeps the sorted-layout stamp; UPDATE drops it") {
    import graft.sources.arrow.ArrowDataSource
    def sortedDir(): String = {
      val d = Files.createTempDirectory("arrow_rlo_sort").toString
      Tables.load(spark, TestSession.Sf, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .repartitionByRange(4, col("o_orderkey"))
        .sortWithinPartitions(col("o_orderkey"))
        .write.format("arrow").option("sortBy", "o_orderkey")
        .mode("overwrite").save(d)
      d
    }
    val del = sortedDir()
    // NOT forces the ReplaceData path (FilterEval refuses it)
    spark.sql(s"DELETE FROM graft.arrow.`$del` " +
      "WHERE NOT (o_orderkey > 1000)")
    val delStamps = ArrowDataSource.visibleIpcFiles(del)
      .map(f => ArrowDataSource.footerInfo(f).sort)
    assert(delStamps.nonEmpty && delStamps.forall(_.contains("o_orderkey")),
      s"delete preserves order, stamps must survive: $delStamps")
    val upd = sortedDir()
    spark.sql(s"UPDATE graft.arrow.`$upd` SET o_orderkey = 0 " +
      "WHERE o_orderkey <= 1000")
    val updStamps = ArrowDataSource.visibleIpcFiles(upd)
      .map(f => ArrowDataSource.footerInfo(f).sort)
    assert(updStamps.exists(_.isEmpty),
      "an update that rewrites the sort column must not claim the " +
        s"stamp on rewritten files: $updStamps")
  }

  test("MERGE withSchemaEvolution: the source's new column evolves " +
      "the target before the CoW rewrite — replaced files materialize " +
      "it, untouched files null-fill it") {
    import spark.implicits._
    val dir = Files.createTempDirectory("arrow_mergeevo").toString
    (1L to 40L).map(i => (i, i * 2L)).toDF("id", "amt")
      .repartitionByRange(4, col("id"))
      .sortWithinPartitions(col("id"))
      .write.format("arrow").mode("overwrite").save(dir)
    graft.sources.arrow.ArrowDataSource.initTableLog(dir)
    val before = graft.sources.arrow.ArrowDataSource.visibleIpcFiles(dir)
      .map(_.toString).toSet
    // CDC source: update low keys (one file's range), insert new ones,
    // and carry a column the target never had
    val src = Seq((3L, 33L, "upd"), (5L, 55L, "upd"), (100L, 1L, "ins"))
      .toDF("id", "amt", "src_tag")
    graft.sources.arrow.MergeInto.withSchemaEvolution(spark, dir, src,
      "mergeevo_spec_src",
      s"""MERGE INTO graft.arrow.`$dir` t
         |USING mergeevo_spec_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val df = spark.read.format("arrow").load(dir)
    assert(df.schema.fieldNames.toSeq == Seq("id", "amt", "src_tag"))
    assert(df.count() == 41)
    // matched + inserted rows carry the column; everything else nulls
    assert(df.filter(col("src_tag") === "upd").select("id")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(3L, 5L))
    assert(df.filter(col("src_tag") === "ins").count() == 1)
    assert(df.filter(col("src_tag").isNull).count() == 38)
    assert(df.filter(col("id") === 3L).head.getLong(1) == 33L)
    // bounded rewrite: files whose ranges hold no matched key keep
    // their exact identity (runtime group filtering)
    val after = graft.sources.arrow.ArrowDataSource.visibleIpcFiles(dir)
      .map(_.toString).toSet
    assert((before intersect after).nonEmpty,
      "every file was rewritten — group filtering lost")
    // carried-over rows in the REPLACED file read null too
    assert(df.filter(col("id") === 4L).head.isNullAt(2))
  }

  test("MERGE withSchemaEvolution on a DV (delta) table: no file " +
      "rewrites, the evolved column still lands") {
    import spark.implicits._
    val dir = Files.createTempDirectory("arrow_mergeevo_dv").toString
    (1L to 40L).map(i => (i, i * 2L)).toDF("id", "amt")
      .repartitionByRange(4, col("id"))
      .sortWithinPartitions(col("id"))
      .write.format("arrow").mode("overwrite").save(dir)
    graft.sources.arrow.ArrowDataSource.initTableLog(dir)
    spark.sql(s"CALL graft.system.set_dv(path => '$dir')").collect()
    val before = graft.sources.arrow.ArrowDataSource.listIpcFiles(dir)
      .map(f => f.toString -> Files.getLastModifiedTime(f)).toMap
    val src = Seq((7L, 77L, "upd"), (200L, 2L, "ins"))
      .toDF("id", "amt", "src_tag")
    graft.sources.arrow.MergeInto.withSchemaEvolution(spark, dir, src,
      "mergeevo_dv_src",
      s"""MERGE INTO graft.arrow.`$dir` t
         |USING mergeevo_dv_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    // merge-on-read: every pre-existing file byte-identical
    val untouched = graft.sources.arrow.ArrowDataSource.listIpcFiles(dir)
      .map(f => f.toString -> Files.getLastModifiedTime(f)).toMap
    assert(before.forall { case (k, v) => untouched.get(k).contains(v) },
      "delta MERGE rewrote a pre-existing file")
    val df = spark.read.format("arrow").load(dir)
    assert(df.count() == 41)
    assert(df.filter(col("src_tag") === "upd").select("amt")
      .head.getLong(0) == 77L)
    assert(df.filter(col("src_tag").isNull).count() == 39)
  }

  test("`_file` metadata column reads on ordinary scans") {
    val dir = rangedDir()
    val paths = spark.read.format("arrow").load(dir)
      .select(col("_file")).distinct().collect().map(_.getString(0))
    assert(paths.length == 4, "one path per range file")
    assert(paths.forall(_.endsWith(".arrow")))
  }

  test("bucketed layouts refuse CoW UPDATE") {
    val dir = Files.createTempDirectory("arrow_rlo_bkt").toString
    Tables.load(spark, TestSession.Sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .write.format("arrow").option("bucketBy", "o_orderkey")
      .option("numBuckets", "4").mode("overwrite").save(dir)
    val e = intercept[Exception] {
      spark.sql(s"UPDATE graft.arrow.`$dir` SET o_totalprice = 0.0 " +
        "WHERE o_orderkey <= 100")
    }
    assert(e.getMessage.contains("bucket"),
      s"must name the bucket contract, got: ${e.getMessage}")
  }

  test("row-level DML addressed at a partition SUBDIRECTORY refuses — " +
      "its removes would land in a nested log root readers never see") {
    import spark.implicits._
    val dir = Files.createTempDirectory("arrow_rlo_subdir").toString
    (1 to 40).map(i => (i.toLong, i * 10L, s"p${i % 2}"))
      .toDF("id", "amount", "part")
      .write.format("arrow").partitionBy("part")
      .mode("overwrite").save(dir)
    graft.sources.arrow.ArrowDataSource.initTableLog(dir)
    for (stmt <- Seq(
        s"DELETE FROM graft.arrow.`$dir/part=p1` WHERE id <= 10",
        s"UPDATE graft.arrow.`$dir/part=p1` SET amount = 0 WHERE id <= 10")) {
      val e = intercept[Exception] { spark.sql(stmt) }
      val msgs = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).map(String.valueOf).mkString("\n")
      assert(msgs.contains("subdirectory"),
        s"expected the table-root guidance, got: $msgs")
    }
    // nothing leaked: no nested log, table unchanged
    assert(!Files.isDirectory(java.nio.file.Paths.get(
      dir, "part=p1", "_graft_metadata")),
      "refused DML still fabricated a nested log")
    assert(spark.read.format("arrow").load(dir).count() == 40)
    // the ROOT-addressed partition-scoped DML is the supported path
    spark.sql(s"DELETE FROM graft.arrow.`$dir` WHERE part = 'p1'")
    assert(spark.read.format("arrow").load(dir).count() == 20)
  }
}

package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.arrow.{ArrowDataSource, GraftCatalog}

/** `CALL graft.system.fsck`: table integrity verification. Healthy
  * tables (flat, logged, DV'd, evolved) return only the PASS summary;
  * seeded corruption — a missing referenced file, a truncated DV
  * sidecar — is flagged by name. Read-only: fsck changes nothing. */
class FsckSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSession.spark
    s.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    s
  }

  private def fsck(dir: String) =
    spark.sql(s"CALL graft.system.fsck(path => '$dir')").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))

  test("healthy tables pass: flat, DV'd, and schema-evolved") {
    import spark.implicits._
    val dir = Files.createTempDirectory("fsck_ok").toString
    (1L to 50L).map(i => (i, i * 2L)).toDF("id", "v1")
      .repartition(2)
      .write.format("arrow").mode("overwrite").save(dir)
    assert(fsck(dir).toSeq == Seq(("ok", "PASS", "2 files checked, 0 findings")))
    ArrowDataSource.initTableLog(dir)
    spark.sql(s"CALL graft.system.set_dv(path => '$dir')").collect()
    spark.sql(s"DELETE FROM graft.arrow.`$dir` WHERE id <= 5")
    spark.sql(s"CALL graft.system.rename_column(path => '$dir', " +
      "old_name => 'v1', new_name => 'v2')").collect()
    spark.sql(s"CALL graft.system.add_column(path => '$dir', " +
      "name => 'note', type => 'string')").collect()
    spark.sql(s"INSERT INTO graft.arrow.`$dir` VALUES (100, 1, 'x')")
    val r = fsck(dir)
    assert(r.length == 1 && r.head._2 == "PASS", r.mkString("\n"))
    // read-only: the table still reads identically after fsck
    assert(spark.read.format("arrow").load(dir).count() == 46)
  }

  test("seeded corruption is flagged by check name") {
    import spark.implicits._
    // missing referenced data file — needs a COMMIT LOG that still
    // references it (a flat dir's listing IS the disk, nothing dangles)
    val d1 = Files.createTempDirectory("fsck_miss").toString
    (1L to 30L).map(i => (i, i)).toDF("id", "v")
      .repartition(3)
      .write.format("arrow").mode("overwrite").save(d1)
    ArrowDataSource.initTableLog(d1)
    val victim = ArrowDataSource.listIpcFiles(d1).head
    Files.delete(victim)
    val r1 = fsck(d1)
    assert(r1.exists(f => f._1 == "file-exists" && f._2 == "FAIL"),
      r1.mkString("\n"))
    assert(r1.last._2 == "FAIL")

    // truncated deletion-vector sidecar
    val d2 = Files.createTempDirectory("fsck_dv").toString
    (1L to 30L).map(i => (i, i)).toDF("id", "v")
      .coalesce(1)
      .write.format("arrow").mode("overwrite").save(d2)
    ArrowDataSource.initTableLog(d2)
    spark.sql(s"CALL graft.system.set_dv(path => '$d2')").collect()
    spark.sql(s"DELETE FROM graft.arrow.`$d2` WHERE id <= 3")
    val dvDir = Paths.get(d2).resolve(ArrowDataSource.DvDirName)
    val dv = Files.list(dvDir).iterator().next()
    Files.write(dv, Array[Byte](0, 1, 2)) // corrupt
    val r2 = fsck(d2)
    assert(r2.exists(f => f._1 == "dv-parses" && f._2 == "FAIL"),
      r2.mkString("\n"))
  }

  test("a physical file NO epoch lists is flagged (the promotion-race " +
      "signature): invisible data must not stay silent") {
    import spark.implicits._
    val dir = Files.createTempDirectory("fsck_unlisted").toString
    (1L to 30L).map(i => (i, i)).toDF("id", "v")
      .repartition(2)
      .write.format("arrow").mode("overwrite").save(dir)
    ArrowDataSource.initTableLog(dir)
    spark.sql(s"INSERT INTO graft.arrow.`$dir` VALUES (100, 1)")
    assert(fsck(dir).last._2 == "PASS")
    // plant a file the log never adopted — what a plain append racing
    // the initTableLog snapshot leaves behind
    val src = ArrowDataSource.listIpcFiles(dir).head
    val orphan = src.getParent.resolve("part-orphan-raced.arrow")
    Files.copy(src, orphan)
    val r = fsck(dir)
    assert(r.exists(f => f._1 == "file-listed" && f._2 == "FAIL" &&
      f._3.contains("part-orphan-raced")), r.mkString("\n"))
    // the orphan is invisible to reads (that's the loss being flagged)
    assert(spark.read.format("arrow").load(dir).count() == 31)
  }
}

package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.arrow.{ArrowDataSource, GraftCatalog}

/** `CALL graft.system.purge` — the right-to-be-forgotten contract:
  * after the pass, the purged rows must be IRRECOVERABLE through every
  * read surface — current reads, VERSION AS OF, deletion-vector masks,
  * and raw on-disk bytes (no invisible file survives, no vector
  * remains, so "visible reads are exact" covers every byte left). */
class ArrowPurgeSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSession.spark
    s.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    s
  }

  private def freshTable(dv: Boolean): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("purge").toString
    (1 to 400).map(i => (i.toLong, s"u$i", i * 2.0))
      .toDF("id", "user", "amt")
      .repartition(3)
      .write.format("arrow").mode("overwrite").save(dir)
    ArrowDataSource.initTableLog(dir)
    if (dv)
      spark.sql(s"CALL graft.system.set_dv(path => '$dir')").collect()
    dir
  }

  private def runPurge(dir: String): (Long, Long, Long) = {
    val r = spark.sql(s"CALL graft.system.purge(path => '$dir', " +
      "predicate => 'id % 5 = 0')").collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  for (dv <- Seq(false, true))
    test(s"purge leaves no trace of the matching rows " +
        s"(${if (dv) "merge-on-read" else "copy-on-write"} table)") {
      val dir = freshTable(dv)
      val root = Paths.get(dir).toAbsolutePath.normalize
      // pre-purge history the vacuum must reclaim past
      spark.sql(s"DELETE FROM graft.arrow.`$dir` WHERE id > 380")
      val prePurgeEpoch = ArrowDataSource.latestCommittedEpoch(root)
      val (dvMat, reclaimed, horizon) = runPurge(dir)
      if (dv) assert(dvMat > 0,
        "merge-on-read purge must materialize the vectored files")
      assert(reclaimed > 0, "purge reclaimed nothing — replaced " +
        "files (the purged bytes) are still on disk")
      // 1. current reads: exact complement
      val back = spark.read.format("arrow").load(dir)
      assert(back.filter(col("id") % 5 === 0).count() == 0)
      assert(back.count() == 380 - 380 / 5)
      // 2. history: the pre-purge version must REFUSE, not resolve
      assert(horizon > prePurgeEpoch,
        s"travel horizon $horizon did not pass pre-purge $prePurgeEpoch")
      val e = intercept[Exception] {
        spark.sql(s"SELECT count(*) FROM graft.arrow.`$dir` " +
          s"VERSION AS OF $prePurgeEpoch").collect()
      }
      assert(e.getMessage != null)
      // 3. no masked bytes: the vector set is empty
      assert(ArrowDataSource.liveDvs(root, None).isEmpty,
        "purge left deletion vectors — masked bytes survive on disk")
      // 4. no invisible files: every .arrow on disk is in the visible
      // set, so (1) covers every remaining byte
      val onDisk = ArrowDataSource.listIpcFiles(dir)
        .map(_.toAbsolutePath.normalize).toSet
      val visible = ArrowDataSource.visibleIpcFiles(dir)
        .map(_.toAbsolutePath.normalize).toSet
      assert(onDisk == visible,
        s"purge left invisible files holding purged bytes: " +
          s"${onDisk diff visible}")
    }

  test("purge works on a shallow CLONE whose deletion vectors sit on " +
      "BORROWED files (the _file-based materialization path)") {
    import spark.implicits._
    val src = Files.createTempDirectory("purge_clone_src").toString
    val dst = Files.createTempDirectory("purge_clone_dst").toString
    Files.delete(Paths.get(dst))
    (1 to 300).map(i => (i.toLong, i * 3.0)).toDF("id", "amt")
      .repartition(2)
      .write.format("arrow").mode("overwrite").save(src)
    ArrowDataSource.initTableLog(src)
    spark.sql(s"CALL graft.system.clone(src_path => '$src', " +
      s"dst_path => '$dst')").collect()
    // vectors on the clone's BORROWED ../ files
    spark.sql(s"CALL graft.system.set_dv(path => '$dst')").collect()
    spark.sql(s"DELETE FROM graft.arrow.`$dst` WHERE id > 280")
    val dstRoot = Paths.get(dst).toAbsolutePath.normalize
    assert(ArrowDataSource.liveDvs(dstRoot, None).nonEmpty,
      "fixture did not produce a vectored borrowed file")
    val r = spark.sql(s"CALL graft.system.purge(path => '$dst', " +
      "predicate => 'id % 5 = 0')").collect()(0)
    assert(r.getLong(0) > 0, "borrowed vectored files not materialized")
    val back = spark.read.format("arrow").load(dst)
    assert(back.filter(col("id") % 5 === 0).count() == 0)
    assert(back.count() == 280 - 280 / 5)
    assert(ArrowDataSource.liveDvs(dstRoot, None).isEmpty,
      "purge left vectors on the clone")
    // the clone no longer REFERENCES any borrowed file (its visible
    // set is root-local); the source's own files are the source's to
    // purge — scope documented on the procedure
    val root = dstRoot
    assert(ArrowDataSource.visibleIpcFiles(dst)
      .forall(_.toAbsolutePath.normalize.startsWith(root)),
      "purged clone still references borrowed files")
    // and the SOURCE is untouched
    assert(spark.read.format("arrow").load(src).count() == 300)
  }

  test("purge refuses on a streaming sink directory") {
    import spark.implicits._
    val dir = Files.createTempDirectory("purge_sink").toString
    val src = Files.createTempDirectory("purge_src").toString
    val ckpt = Files.createTempDirectory("purge_ckpt").toString
    (1 to 10).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
      .write.format("arrow").mode("overwrite").save(src)
    val q = spark.readStream.format("arrow").load(src)
      .writeStream.format("arrow")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(dir)
    try q.processAllAvailable() finally q.stop()
    val e = intercept[Exception] {
      spark.sql(s"CALL graft.system.purge(path => '$dir', " +
        "predicate => 'id = 1')").collect()
    }
    assert(e.getMessage.contains("streaming sink"), e.getMessage)
  }
}

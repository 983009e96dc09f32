package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.arrow.ArrowDataSource

/** Admission control on the streaming source
  * (`option("maxFilesPerTrigger", n)`): a deep backlog drains in
  * bounded micro-batches instead of one giant first trigger — exactly
  * once, no file read twice or skipped. Flat directories cap at file
  * granularity; sink directories keep epoch granularity (the epoch
  * manifest is the atomic unit). */
class ArrowAdmissionSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def drain(dir: String, maxFiles: Int): Seq[Long] = {
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("arrow")
      .option("maxFilesPerTrigger", maxFiles.toString)
      .load(dir)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.synchronized { batches += df.count() }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        Files.createTempDirectory("adm_ckpt").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    batches.toSeq
  }

  test("flat backlog drains in maxFilesPerTrigger-sized batches") {
    val dir = Files.createTempDirectory("adm_flat").toString
    spark.range(0, 60).selectExpr("id", "id % 6 AS b")
      .repartitionByRange(6, col("b"))
      .write.format("arrow").mode("overwrite").save(dir)
    assert(ArrowDataSource.visibleIpcFiles(dir).size == 6)
    val batches = drain(dir, maxFiles = 2)
    val nonEmpty = batches.filter(_ > 0)
    assert(nonEmpty.length == 3,
      s"6 files / cap 2 = 3 micro-batches, got $batches")
    assert(batches.sum == 60, "every row exactly once")
  }

  test("sink backlog drains at epoch granularity under the cap") {
    val dir = Files.createTempDirectory("adm_sink").toString
    spark.range(0, 60).selectExpr("id", "id % 6 AS b")
      .repartitionByRange(6, col("b"))
      .write.format("arrow").mode("overwrite").save(dir)
    val files = ArrowDataSource.visibleIpcFiles(dir)
      .map(_.toString).sorted
    assert(files.size == 6)
    // three committed epochs of two files each
    files.grouped(2).zipWithIndex.foreach { case (fs, e) =>
      ArrowDataSource.commitEpochManifest(dir, e.toLong, fs)
    }
    val batches = drain(dir, maxFiles = 3)
    val nonEmpty = batches.filter(_ > 0)
    assert(nonEmpty.length == 3,
      s"cap 3 fits one 2-file epoch per trigger, got $batches")
    assert(batches.sum == 60, "every row exactly once")
  }

  test("without the option one trigger takes everything") {
    val dir = Files.createTempDirectory("adm_all").toString
    spark.range(0, 30).selectExpr("id", "id % 3 AS b")
      .repartitionByRange(3, col("b"))
      .write.format("arrow").mode("overwrite").save(dir)
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("arrow").load(dir)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.synchronized { batches += df.count() }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        Files.createTempDirectory("adm_ckpt").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(batches.filter(_ > 0) == Seq(30L))
  }
}

package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.arrow.ArrowDataSource

/** Exactly-once semantics of the Arrow streaming sink: the per-epoch
  * commit manifest (`_graft_metadata/<epoch>.manifest`, Spark file
  * sink's `_spark_metadata` pattern) is the read-side source of truth,
  * so task-retry and epoch-replay orphans on disk never surface as
  * duplicate rows. */
class ArrowExactlyOnceSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def sinkDir(): (String, Long) = {
    val out = Files.createTempDirectory("xo_sink").toString
    val ckpt = Files.createTempDirectory("xo_ckpt").toString
    val src = Files.createTempDirectory("xo_src").toString
    val batch = Tables.events(spark, TestSession.Sf)
      .select(col("event_id"), col("user_id"), col("event_type"))
    batch.write.format("arrow").mode("overwrite").save(src)
    val q = spark.readStream.format("arrow").load(src)
      .writeStream.format("arrow")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start(out)
    try q.processAllAvailable() finally q.stop()
    (out, batch.count())
  }

  test("a retried task's orphan file is invisible to every reader") {
    val (out, expected) = sinkDir()
    assert(Files.isDirectory(Paths.get(out, ArrowDataSource.MetadataDirName)),
      "streaming sink wrote no commit manifest")
    assert(spark.read.format("arrow").load(out).count() == expected)
    // simulate a task retried AFTER its file went visible-on-disk: a
    // second copy of a committed file that never entered any manifest
    val committed = ArrowDataSource.visibleIpcFiles(out).head
    val orphan = committed.getParent.resolve("part-99999-retry-dead.arrow")
    Files.copy(committed, orphan, StandardCopyOption.REPLACE_EXISTING)
    assert(ArrowDataSource.listIpcFiles(out).map(_.toString)
      .contains(orphan.toString), "orphan must exist on disk")
    assert(!ArrowDataSource.visibleIpcFiles(out).map(_.toString)
      .contains(orphan.toString), "orphan must be invisible")
    assert(spark.read.format("arrow").load(out).count() == expected,
      "orphan file duplicated rows through the batch reader")
    // the streaming source composes with the sink: same visibility
    val out2 = Files.createTempDirectory("xo_sink2").toString
    val ckpt2 = Files.createTempDirectory("xo_ckpt2").toString
    val q = spark.readStream.format("arrow").load(out)
      .writeStream.format("arrow")
      .option("checkpointLocation", ckpt2)
      .trigger(Trigger.AvailableNow()).start(out2)
    try q.processAllAvailable() finally q.stop()
    assert(spark.read.format("arrow").load(out2).count() == expected,
      "orphan file leaked through the streaming source")
  }

  test("epoch commit is idempotent: a replayed epoch cannot re-commit") {
    val dir = Files.createTempDirectory("xo_epoch").toString
    Files.createDirectories(Paths.get(dir))
    val f1 = Paths.get(dir, "part-00000-a.arrow")
    val f2 = Paths.get(dir, "part-00000-b.arrow")
    Files.write(f1, Array[Byte](1))
    Files.write(f2, Array[Byte](2))
    ArrowDataSource.commitEpochManifest(dir, 7L, Seq(f1.toString))
    // driver recovered and replayed epoch 7 with a DIFFERENT file set
    ArrowDataSource.commitEpochManifest(dir, 7L, Seq(f2.toString))
    val visible = ArrowDataSource.visibleIpcFiles(dir).map(_.toString)
    assert(visible == Seq(f1.toString),
      s"first manifest must win, got $visible")
  }

  test("batch overwrite of a former sink directory clears the manifest") {
    val (out, _) = sinkDir()
    val fresh = Tables.load(spark, TestSession.Sf, "region")
    fresh.write.format("arrow").mode("overwrite").save(out)
    assert(!Files.exists(Paths.get(out, ArrowDataSource.MetadataDirName)),
      "truncate must drop the stale manifest")
    val back = spark.read.format("arrow").load(out)
    assert(back.count() == fresh.count())
  }
}

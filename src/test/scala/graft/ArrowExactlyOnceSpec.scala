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

  test("manifest log compacts: many epochs leave one snapshot + tail") {
    val dir = Files.createTempDirectory("xo_compact").toString
    val files = (0 until 25).map { e =>
      val f = Paths.get(dir, f"part-$e%05d-x.arrow")
      Files.write(f, Array[Byte](e.toByte))
      f
    }
    files.zipWithIndex.foreach { case (f, e) =>
      ArrowDataSource.commitEpochManifest(dir, e.toLong, Seq(f.toString))
    }
    val md = Paths.get(dir, ArrowDataSource.MetadataDirName)
    val names = Files.list(md).iterator()
    val entries = new scala.collection.mutable.ArrayBuffer[String]
    while (names.hasNext) entries += names.next().getFileName.toString
    val compacts = entries.filter(_.endsWith(".compact"))
    val manifests = entries.filter(_.endsWith(".manifest"))
    // interval 10: epochs 0-9 folded at 9, 10-19 folded at 19; only the
    // latest snapshot plus the post-snapshot tail (20..24) remain — a
    // listing reads O(1) snapshots + O(interval) manifests however long
    // the stream has lived
    assert(compacts == Seq("19.compact"), s"snapshots: $compacts")
    assert(manifests.map(_.takeWhile(_ != '.').toLong).sorted ==
      Seq(20L, 21L, 22L, 23L, 24L), s"tail manifests: $manifests")
    assert(ArrowDataSource.visibleIpcFiles(dir).map(_.toString).sorted ==
      files.map(_.toString).sorted,
      "compaction changed the visible file set")
    // a replayed epoch folded into the snapshot cannot re-commit
    val late = Paths.get(dir, "part-00003-replay.arrow")
    Files.write(late, Array[Byte](99))
    ArrowDataSource.commitEpochManifest(dir, 3L, Seq(late.toString))
    assert(!ArrowDataSource.visibleIpcFiles(dir).map(_.toString)
      .contains(late.toString),
      "replay of a compacted epoch resurfaced fresh files")
  }

  test("reading a partition subdirectory of a sink honors the commit log") {
    val root = Files.createTempDirectory("xo_subdir").toString
    val part = Paths.get(root, "c=1")
    Files.createDirectories(part)
    val committed = part.resolve("part-00000-ok.arrow")
    Files.write(committed, Array[Byte](1))
    ArrowDataSource.commitEpochManifest(root, 0L, Seq(committed.toString))
    val orphan = part.resolve("part-00001-retry-dead.arrow")
    Files.write(orphan, Array[Byte](2))
    // querying the sink ROOT hides the orphan...
    assert(!ArrowDataSource.visibleIpcFiles(root).map(_.toString)
      .contains(orphan.toString))
    // ...and so must querying the partition SUBDIRECTORY — the commit
    // log lives at the sink root, but visibility walks up to it
    val sub = ArrowDataSource.visibleIpcFiles(part.toString).map(_.toString)
    assert(sub == Seq(committed.toString),
      s"partition-subdir read bypassed the commit log: $sub")
  }

  test("batch append into a sink directory fails fast, overwrite works") {
    val (out, _) = sinkDir()
    val fresh = Tables.load(spark, TestSession.Sf, "region")
    val e = intercept[Exception] {
      fresh.write.format("arrow").mode("append").save(out)
    }
    def rootCauseChain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(rootCauseChain(e).exists(_.contains("commit log")),
      s"append must refuse to write reader-invisible files, got: $e")
  }

  test("streaming from a sink uses the bounded epoch offset across restarts") {
    val origin = Files.createTempDirectory("xo_origin").toString
    val mid = Files.createTempDirectory("xo_mid").toString // sink AND source
    val ckptA = Files.createTempDirectory("xo_cka").toString
    val ckptB = Files.createTempDirectory("xo_ckb").toString
    val dest = Files.createTempDirectory("xo_dest").toString
    val all = Tables.events(spark, TestSession.Sf)
      .select(col("event_id"), col("user_id"))
    def feed(pred: org.apache.spark.sql.Column, mode: String): Unit = {
      all.filter(pred).write.format("arrow").mode(mode).save(origin)
      val q = spark.readStream.format("arrow").load(origin)
        .writeStream.format("arrow")
        .option("checkpointLocation", ckptA)
        .trigger(Trigger.AvailableNow()).start(mid)
      try q.processAllAvailable() finally q.stop()
    }
    def drain(): Long = {
      val q = spark.readStream.format("arrow").load(mid)
        .writeStream.format("arrow")
        .option("checkpointLocation", ckptB)
        .trigger(Trigger.AvailableNow()).start(dest)
      try q.processAllAvailable() finally q.stop()
      spark.read.format("arrow").load(dest).count()
    }
    feed(col("event_id") < 300, "overwrite")
    val firstCount = all.filter(col("event_id") < 300).count()
    assert(drain() == firstCount)
    // the committed offset must be the compact epoch form, not a file list
    val offsetFile = Paths.get(ckptB, "offsets", "0")
    assert(Files.exists(offsetFile), "no committed offset")
    val allLines = Files.readAllLines(offsetFile)
    val offsetJson = allLines.get(allLines.size - 1)
    assert(offsetJson.contains("\"epoch\""),
      s"sink-backed source should checkpoint an epoch offset: $offsetJson")
    // append a second sink epoch; a restarted stream reads ONLY the delta
    feed(col("event_id") >= 300, "append")
    assert(drain() == all.count(),
      "epoch-offset restart re-read or missed an epoch delta")
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

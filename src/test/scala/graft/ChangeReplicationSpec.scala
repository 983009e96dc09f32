package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.arrow.GraftCatalog
import graft.streaming.ChangeReplication

/** CDC replication built on the streaming change feed + keyed MERGE:
  * a replica drained via [[ChangeReplication.replicate]] must equal
  * the source snapshot at every drained offset — across the initial
  * snapshot, CoW DELETEs, UPDATEs (delete+insert pairs superseding by
  * key), and catch-up runs resuming from the checkpoint. */
class ChangeReplicationSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSession.spark
    s.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    s
  }

  private def bagEqual(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  private def snapshot(dir: String): DataFrame =
    spark.read.format("arrow").load(dir).select(col("id"), col("tag"))

  test("replica converges to the source across DML epochs and " +
      "checkpointed catch-up runs") {
    import spark.implicits._
    val src = Files.createTempDirectory("repl_src").toString
    val dst = Files.createTempDirectory("repl_dst").toString
    val ckpt = Files.createTempDirectory("repl_ckpt").toString
    (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "tag")
      .repartition(2)
      .write.format("arrow").mode("overwrite").save(src)
    // bootstrap an EMPTY replica carrying the schema
    (1 to 1).map(i => (i.toLong, "x")).toDF("id", "tag").limit(0)
      .coalesce(1)
      .write.format("arrow").mode("overwrite").save(dst)
    assert(spark.read.format("arrow").load(dst).count() == 0)

    // epoch history on the source: snapshot + delete + update
    spark.sql(s"DELETE FROM graft.arrow.`$src` WHERE id <= 20")
    spark.range(30, 41).selectExpr("id AS k", "'patched' AS p")
      .createOrReplaceTempView("repl_patch")
    spark.sql(
      s"""MERGE INTO graft.arrow.`$src` t USING repl_patch s
         |ON t.id = s.k
         |WHEN MATCHED THEN UPDATE SET tag = s.p""".stripMargin)

    val q = ChangeReplication.replicate(spark, src, dst,
      keyCols = Seq("id"), checkpoint = ckpt)
    try q.processAllAvailable() finally q.stop()
    assert(bagEqual(snapshot(dst), snapshot(src)),
      "replica diverged after initial catch-up")
    assert(snapshot(dst).filter(col("tag") === "patched").count() == 11)

    // more DML while replication is down; resume from the checkpoint
    spark.sql(s"DELETE FROM graft.arrow.`$src` WHERE id % 7 = 0")
    spark.range(200, 206).selectExpr("id AS k", "'late' AS p")
      .createOrReplaceTempView("repl_late")
    spark.sql(
      s"""MERGE INTO graft.arrow.`$src` t USING repl_late s
         |ON t.id = s.k
         |WHEN MATCHED THEN UPDATE SET tag = s.p
         |WHEN NOT MATCHED THEN INSERT (id, tag) VALUES (s.k, s.p)""".stripMargin)
    val q2 = ChangeReplication.replicate(spark, src, dst,
      keyCols = Seq("id"), checkpoint = ckpt)
    try q2.processAllAvailable() finally q2.stop()
    assert(bagEqual(snapshot(dst), snapshot(src)),
      "replica diverged after resume")
    assert(snapshot(dst).filter(col("tag") === "late").count() == 6)

    // re-applying an already-applied batch is a no-op (idempotent by
    // key): force-apply the full feed once more against the replica
    val feed = spark.readStream.format("arrow")
      .option("readChangeFeed", "true").option("startingEpoch", 0L)
      .load(src)
    val replay = feed.writeStream
      .format("memory").queryName("repl_replay").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try replay.processAllAvailable() finally replay.stop()
    val sunk = spark.table("repl_replay")
    val materialized = spark.createDataFrame(
      java.util.Arrays.asList(sunk.collect(): _*), sunk.schema)
    ChangeReplication.applyBatch(materialized, dst, Seq("id"))
    assert(bagEqual(snapshot(dst), snapshot(src)),
      "replay of applied changes changed the replica")
  }

  test("a 50-epoch backlog coalesces to a bounded job count — not " +
      "2 MERGE jobs per epoch — with exact last-touch-wins state") {
    import spark.implicits._
    val src = Files.createTempDirectory("repl_coal_src").toString
    val dst = Files.createTempDirectory("repl_coal_dst").toString
    (1 to 10).map(i => (i.toLong, s"v$i")).toDF("id", "tag")
      .coalesce(1)
      .write.format("arrow").mode("overwrite").save(src)
    // upgrade to a logged table up front so every INSERT below
    // commits its own epoch (a flat dir would absorb them silently)
    graft.sources.arrow.ArrowDataSource.initTableLog(src)
    (1 to 1).map(i => (i.toLong, "x")).toDF("id", "tag").limit(0)
      .coalesce(1)
      .write.format("arrow").mode("overwrite").save(dst)
    // 50 DML epochs, with epoch-order-sensitive key histories the
    // coalescing must preserve: id=3 deleted then re-inserted (must
    // end PRESENT), id=4 updated then deleted (must end ABSENT)
    for (i <- 1 to 44)
      spark.sql(s"INSERT INTO graft.arrow.`$src` VALUES (${100L + i}, 'e$i')")
    spark.sql(s"DELETE FROM graft.arrow.`$src` WHERE id = 3")
    spark.sql(s"DELETE FROM graft.arrow.`$src` WHERE id = 103")
    spark.sql(s"INSERT INTO graft.arrow.`$src` VALUES (3, 'reborn')")
    spark.sql(s"UPDATE graft.arrow.`$src` SET tag = 'doomed' WHERE id = 4")
    spark.sql(s"UPDATE graft.arrow.`$src` SET tag = 'kept' WHERE id = 5")
    spark.sql(s"DELETE FROM graft.arrow.`$src` WHERE id = 4")
    // drain the whole feed into one static batch (the catch-up shape)
    val feed = spark.readStream.format("arrow")
      .option("readChangeFeed", "true").option("startingEpoch", 0L)
      .load(src)
    val drain = feed.writeStream
      .format("memory").queryName("repl_coal").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try drain.processAllAvailable() finally drain.stop()
    val sunk = spark.table("repl_coal")
    assert(sunk.select(col("_commit_epoch")).distinct().count() >= 50,
      "fixture did not produce a 50-epoch backlog")
    val materialized = spark.createDataFrame(
      java.util.Arrays.asList(sunk.collect(): _*), sunk.schema)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try ChangeReplication.applyBatch(materialized, dst, Seq("id"))
    finally {
      Thread.sleep(2000) // listener bus is async; let events drain
      spark.sparkContext.removeSparkListener(listener)
    }
    assert(jobs.get() <= 30,
      s"50-epoch apply ran ${jobs.get()} jobs — per-epoch serial " +
        "MERGEs are back; coalescing should keep this O(1) in epochs")
    assert(bagEqual(snapshot(dst), snapshot(src)),
      "coalesced replica diverged from the source")
    assert(snapshot(dst).filter(col("id") === 3)
      .select(col("tag")).as[String].collect().toSeq == Seq("reborn"),
      "delete-then-reinsert key must end present with the final value")
    assert(snapshot(dst).filter(col("id") === 4).count() == 0,
      "update-then-delete key must end absent")
    assert(snapshot(dst).filter(col("id") === 5)
      .select(col("tag")).as[String].collect().toSeq == Seq("kept"))
  }
}

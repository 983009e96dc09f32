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
}

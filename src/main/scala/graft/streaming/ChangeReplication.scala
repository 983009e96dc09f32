package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.arrow.{ArrowChanges, GraftCatalog}

/** CDC replication on the engine's own primitives: tail a logged
  * table's STREAMING change feed (`readChangeFeed`) and apply each
  * committed epoch to a replica table with keyed MERGE — the
  * materialized-replica pattern every CDC consumer builds.
  *
  * Apply algebra per epoch (ascending): with `I` the epoch's
  * insert-tagged rows and `D` its delete-tagged rows,
  *
  *   upserts  = I \ D   (multiset)  — copy-on-write carry-over rows
  *                                    appear in BOTH and cancel, so
  *                                    unchanged rows are never written;
  *   removals = keys(D \ I) minus keys(upserts) — an UPDATE's old
  *                                    version shares its key with the
  *                                    new one and is superseded, not
  *                                    deleted.
  *
  * Each step is a keyed MERGE into the replica, so re-applying a
  * replayed micro-batch (foreachBatch is at-least-once) converges to
  * the same state — idempotence comes from the keys, not the
  * transport. Epoch order matters (a key deleted then re-inserted in
  * consecutive epochs must end present), row order within an epoch
  * does not.
  *
  * Scale: each trigger moves O(churned bytes) through one MERGE per
  * epoch; the replica's copy-on-write rewrite touches only files
  * holding matched keys (runtime group filtering), so a day of DML
  * against a petabyte source replicates a day of changes. */
object ChangeReplication {

  /** Start replicating `srcDir`'s change feed into `dstDir` (an
    * existing arrow table, possibly empty) keyed by `keyCols`.
    * Drains everything committed at start when `availableNow`
    * (batch-style catch-up), else runs continuously. */
  def replicate(spark: SparkSession, srcDir: String, dstDir: String,
      keyCols: Seq[String], checkpoint: String,
      startingEpoch: Long = 0L,
      availableNow: Boolean = true): StreamingQuery = {
    require(keyCols.nonEmpty, "replicate needs at least one key column")
    if (spark.conf.getOption("spark.sql.catalog.graft").isEmpty)
      spark.conf.set("spark.sql.catalog.graft",
        classOf[GraftCatalog].getName)
    val feed = spark.readStream.format("arrow")
      .option("readChangeFeed", "true")
      .option("startingEpoch", startingEpoch)
      .load(srcDir)
    val writer = feed.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch, dstDir, keyCols)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow())
    else writer).start()
  }

  /** Apply one micro-batch of tagged change rows (possibly spanning
    * several epochs) to the replica, epoch by epoch in commit order. */
  def applyBatch(batch: DataFrame, dstDir: String,
      keyCols: Seq[String]): Unit = {
    val spark = batch.sparkSession
    val dataCols = batch.columns.toSeq
      .filterNot(c => c == ArrowChanges.ChangeTypeCol ||
        c == ArrowChanges.CommitEpochCol)
    require(keyCols.forall(dataCols.contains),
      s"key columns ${keyCols.mkString(",")} not all present in " +
        s"${dataCols.mkString(",")}")
    val cached = batch.persist()
    try {
      // the epoch list is checkpoint-window-sized metadata, not data
      val epochs = cached.select(col(ArrowChanges.CommitEpochCol))
        .distinct().collect().map(_.getLong(0)).sorted
      val onKeys = keyCols.map(k => s"t.`$k` = s.`$k`").mkString(" AND ")
      val setCols = dataCols.map(c => s"`$c` = s.`$c`").mkString(", ")
      val insCols = dataCols.map(c => s"`$c`").mkString(", ")
      val insVals = dataCols.map(c => s"s.`$c`").mkString(", ")
      for (e <- epochs) {
        val ofEpoch = cached
          .filter(col(ArrowChanges.CommitEpochCol) === e)
        val ins = ofEpoch
          .filter(col(ArrowChanges.ChangeTypeCol) === "insert")
          .selectExpr(dataCols.map(c => s"`$c`"): _*)
        val del = ofEpoch
          .filter(col(ArrowChanges.ChangeTypeCol) === "delete")
          .selectExpr(dataCols.map(c => s"`$c`"): _*)
        val upserts = ins.exceptAll(del)
        val removals = del.exceptAll(ins)
          .select(keyCols.map(col): _*)
          .exceptAll(upserts.select(keyCols.map(col): _*))
          .distinct()
        upserts.createOrReplaceTempView("graft_repl_upserts")
        removals.createOrReplaceTempView("graft_repl_removals")
        spark.sql(
          s"""MERGE INTO graft.arrow.`$dstDir` t
             |USING graft_repl_upserts s ON $onKeys
             |WHEN MATCHED THEN UPDATE SET $setCols
             |WHEN NOT MATCHED THEN INSERT ($insCols)
             |  VALUES ($insVals)""".stripMargin)
        spark.sql(
          s"""MERGE INTO graft.arrow.`$dstDir` t
             |USING graft_repl_removals s ON $onKeys
             |WHEN MATCHED THEN DELETE""".stripMargin)
      }
    } finally { cached.unpersist(); () }
  }
}

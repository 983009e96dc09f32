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
    // stable writer identity scoped to the checkpoint (its batchId
    // sequence): replayed batches are gated before any job runs
    val appId = "graft_repl_" + java.util.UUID
      .nameUUIDFromBytes(checkpoint.getBytes("UTF-8")).toString
    val writer = feed.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, dstDir, keyCols, Some((appId, batchId)))
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow())
    else writer).start()
  }

  /** Per-call counter making each applyBatch's temp view names unique:
    * two replicate() streams sharing one SparkSession interleave
    * foreachBatch callbacks, and a session-global view name would let
    * one stream's MERGE read the other's rows mid-epoch. */
  private val applySeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Apply one micro-batch of tagged change rows (possibly spanning
    * many epochs) to the replica in ONE keyed MERGE total, however
    * long the epoch backlog:
    *
    *  1. Net per-(epoch, row) effect — one aggregation over the batch.
    *     Copy-on-write carry-over rows surface as insert+delete of
    *     equal values within one epoch and cancel here (the per-epoch
    *     `exceptAll` of the sequential formulation, computed
    *     set-at-once).
    *  2. Last-touch-wins per key — the replica MERGE is keyed, so the
    *     final state of a key is decided solely by the GREATEST epoch
    *     in the batch touching it; within that epoch an upsert
    *     supersedes a delete of the same key (an UPDATE's old version
    *     is superseded, not deleted). One window, `row_number = 1`.
    *  3. ONE MERGE of the winners: matched deletes DELETE, matched
    *     upserts UPDATE, unmatched upserts INSERT (winners are unique
    *     per key, so upsert and removal key sets never overlap).
    *
    * This coalescing is exactly equivalent to applying epochs
    * ascending one MERGE at a time (each later epoch's MERGE
    * overwrites what the earlier left for a key), while a
    * thousand-epoch catch-up backlog costs 1 job instead of 2000 —
    * the fix for serial per-epoch driver loops at scale. The single
    * MERGE is also ONE replica epoch: a crash can no longer land
    * upserts without their removals. Replay safety is belt and
    * braces: the keyed MERGE converges under re-application, and
    * when `txn` is given the batch's `(appId, version)` stamp commits
    * atomically with the epoch, so a replayed batch is skipped before
    * any job runs ([[graft.sources.arrow.ArrowDataSource.withPendingTxn]]). */
  def applyBatch(batch: DataFrame, dstDir: String,
      keyCols: Seq[String],
      txn: Option[(String, Long)] = None): Unit = {
    val spark = batch.sparkSession
    val dstRoot = java.nio.file.Paths.get(dstDir).toAbsolutePath.normalize
    if (txn.exists { case (app, v) =>
      graft.sources.arrow.ArrowDataSource
        .lastTxnVersion(dstRoot, app).exists(_ >= v)
    }) return // replayed micro-batch: already applied atomically
    val dataCols = batch.columns.toSeq
      .filterNot(c => c == ArrowChanges.ChangeTypeCol ||
        c == ArrowChanges.CommitEpochCol)
    require(keyCols.forall(dataCols.contains),
      s"key columns ${keyCols.mkString(",")} not all present in " +
        s"${dataCols.mkString(",")}")
    val ec = col(ArrowChanges.CommitEpochCol)
    val tc = col(ArrowChanges.ChangeTypeCol)
    val net = batch
      .groupBy(ec +: dataCols.map(col): _*)
      .agg(
        // update_postimage/update_preimage are an UPDATE epoch's
        // new/old values — insert/delete-equivalent under netting
        sum(when(tc.isin("insert", ArrowChanges.UpdatePostimage), 1L)
          .otherwise(0L)).as("__ins"),
        sum(when(tc.isin("delete", ArrowChanges.UpdatePreimage), 1L)
          .otherwise(0L)).as("__del"))
      .withColumn("__op",
        when(col("__ins") > col("__del"), lit("upsert"))
          .when(col("__del") > col("__ins"), lit("delete")))
      .filter(col("__op").isNotNull) // carry-over rows cancel to null
    val winners = net
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(keyCols.map(col): _*)
          // greatest epoch wins; within it, upsert beats delete
          .orderBy(ec.desc, col("__op").desc)))
      .filter(col("__rn") === 1)
      .select((dataCols.map(c => col(s"`$c`")) :+ col("__op")): _*)
    val view = s"graft_repl_${applySeq.incrementAndGet()}_" +
      java.util.UUID.randomUUID().toString.takeRight(12)
    try {
      winners.createOrReplaceTempView(view)
      val onKeys = keyCols.map(k => s"t.`$k` = s.`$k`").mkString(" AND ")
      val setCols = dataCols.map(c => s"`$c` = s.`$c`").mkString(", ")
      val insCols = dataCols.map(c => s"`$c`").mkString(", ")
      val insVals = dataCols.map(c => s"s.`$c`").mkString(", ")
      val merge =
        s"""MERGE INTO graft.arrow.`$dstDir` t
           |USING $view s ON $onKeys
           |WHEN MATCHED AND s.`__op` = 'delete' THEN DELETE
           |WHEN MATCHED THEN UPDATE SET $setCols
           |WHEN NOT MATCHED AND s.`__op` = 'upsert' THEN
           |  INSERT ($insCols) VALUES ($insVals)""".stripMargin
      txn match {
        case Some((app, v)) =>
          graft.sources.arrow.ArrowDataSource
            .withPendingTxn(dstDir, app, v) { spark.sql(merge); () }
        case None => spark.sql(merge); ()
      }
    } finally {
      spark.catalog.dropTempView(view)
      ()
    }
  }
}

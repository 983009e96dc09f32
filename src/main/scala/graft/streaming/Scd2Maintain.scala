package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.arrow.{ArrowChanges, GraftCatalog}

/** Incremental SCD TYPE-2 dimension maintenance from a logged table's
  * change feed — the third CDC consumer next to the keyed replica
  * ([[ChangeReplication]]) and the additive rollup
  * ([[IncrementalView]]): instead of the source's CURRENT state, the
  * dimension keeps every key's full VERSION HISTORY as half-open
  * epoch intervals
  *
  *   (data..., valid_from, valid_to, is_current)
  *
  * where `valid_from` is the commit epoch that produced the version,
  * `valid_to` the epoch that superseded (or deleted) it — NULL while
  * open — and `is_current` marks the one open version of a live key.
  *
  * Apply algebra per micro-batch (which may span many epochs):
  *  1. net per-(epoch, row) — copy-on-write carry-over rows surface as
  *     insert+delete of equal values within one epoch and cancel;
  *  2. one EVENT per (key, epoch) — an UPDATE's old version shares the
  *     epoch with its replacement and is superseded (upsert beats
  *     delete), leaving either `upsert(values)` or `delete`;
  *  3. version intervals by a per-key `lead(epoch)`: every upsert event
  *     opens a version at its epoch, closed by the key's next event in
  *     the batch (still open if none — that version is current unless a
  *     trailing delete closed it);
  *  4. ONE MERGE: each key's first batch event CLOSES the dimension's
  *     existing open version (valid_to = first event epoch), and the
  *     precomputed version rows INSERT. The close arm is guarded by
  *     `t.valid_from < s.close_epoch`, so replaying the whole batch
  *     matches nothing and the MERGE is idempotent even before the
  *     transaction stamp skips it ([[graft.sources.arrow.ArrowDataSource
  *     .withPendingTxn]] replay gate, belt and braces like the other
  *     CDC consumers).
  *
  * Scale: a petabyte dimension absorbs a day of churn as O(churned
  * keys) MERGE work — runtime group filtering rewrites only files
  * holding touched keys' open versions, closed history is never read
  * or written again (time-partition it by `valid_to` and the MERGE's
  * `is_current` arm prunes to the open partition at planning time). */
object Scd2Maintain {
  val ValidFromCol = "valid_from"
  val ValidToCol = "valid_to"
  val IsCurrentCol = "is_current"

  /** Start maintaining `dimDir` (an existing arrow table with the
    * source's data columns plus the three SCD2 columns, possibly
    * empty) from `srcDir`'s change feed, keyed by `keyCols` (which
    * must be unique in the source). */
  def maintain(spark: SparkSession, srcDir: String, dimDir: String,
      keyCols: Seq[String], checkpoint: String,
      startingEpoch: Long = 0L,
      availableNow: Boolean = true): StreamingQuery = {
    require(keyCols.nonEmpty, "scd2 needs at least one key column")
    if (spark.conf.getOption("spark.sql.catalog.graft").isEmpty)
      spark.conf.set("spark.sql.catalog.graft",
        classOf[GraftCatalog].getName)
    val feed = spark.readStream.format("arrow")
      .option("readChangeFeed", "true")
      .option("startingEpoch", startingEpoch)
      .load(srcDir)
    val appId = "graft_scd2_" + java.util.UUID
      .nameUUIDFromBytes(checkpoint.getBytes("UTF-8")).toString
    val writer = feed.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, dimDir, keyCols, Some((appId, batchId)))
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow())
    else writer).start()
  }

  private val applySeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Apply one micro-batch of tagged change rows to the dimension in
    * one MERGE (see the object doc for the algebra). */
  def applyBatch(batch: DataFrame, dimDir: String,
      keyCols: Seq[String],
      txn: Option[(String, Long)] = None): Unit = {
    val spark = batch.sparkSession
    val dimRoot = java.nio.file.Paths.get(dimDir).toAbsolutePath.normalize
    if (txn.exists { case (app, v) =>
      graft.sources.arrow.ArrowDataSource
        .lastTxnVersion(dimRoot, app).exists(_ >= v)
    }) return // replayed micro-batch: already applied atomically
    val dataCols = batch.columns.toSeq
      .filterNot(c => c == ArrowChanges.ChangeTypeCol ||
        c == ArrowChanges.CommitEpochCol)
    require(keyCols.forall(dataCols.contains),
      s"key columns ${keyCols.mkString(",")} not all present in " +
        s"${dataCols.mkString(",")}")
    val ec = col(ArrowChanges.CommitEpochCol)
    val tc = col(ArrowChanges.ChangeTypeCol)
    // 1. net per-(epoch, row): CoW carry-over cancels
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
      .filter(col("__op").isNotNull)
    // 2. one event per (key, epoch): upsert supersedes delete
    val perKeyEpoch = Window
      .partitionBy((keyCols.map(col) :+ ec): _*)
      .orderBy(col("__op").desc)
    val wk = Window.partitionBy(keyCols.map(col): _*)
    val events = net
      .withColumn("__rn", row_number().over(perKeyEpoch))
      .filter(col("__rn") === 1)
      // 3. per-key interval endpoints
      .withColumn("__next", lead(ec, 1).over(wk.orderBy(ec.asc)))
      .withColumn("__first", min(ec).over(wk))
    val dcols = dataCols.map(c => col(s"`$c`"))
    val inserts = events.filter(col("__op") === "upsert")
      .select(dcols ++ Seq(
        ec.cast("long").as(ValidFromCol),
        col("__next").cast("long").as(ValidToCol),
        col("__next").isNull.as(IsCurrentCol),
        lit("insert").as("__action"),
        lit(-1L).as("__close_epoch")): _*)
    val closes = events.filter(ec === col("__first"))
      .select(dcols ++ Seq(
        lit(-1L).as(ValidFromCol),
        lit(null).cast("long").as(ValidToCol),
        lit(false).as(IsCurrentCol),
        lit("close").as("__action"),
        ec.cast("long").as("__close_epoch")): _*)
    val view = s"graft_scd2_${applySeq.incrementAndGet()}_" +
      java.util.UUID.randomUUID().toString.takeRight(12)
    try {
      inserts.unionAll(closes).createOrReplaceTempView(view)
      val onKeys = keyCols.map(k => s"t.`$k` = s.`$k`").mkString(" AND ")
      val insCols = (dataCols ++
        Seq(ValidFromCol, ValidToCol, IsCurrentCol))
        .map(c => s"`$c`").mkString(", ")
      val insVals = (dataCols ++
        Seq(ValidFromCol, ValidToCol, IsCurrentCol))
        .map(c => s"s.`$c`").mkString(", ")
      val merge =
        s"""MERGE INTO graft.arrow.`$dimDir` t
           |USING $view s ON $onKeys AND (
           |  (s.`__action` = 'close' AND t.`$IsCurrentCol`
           |     AND t.`$ValidFromCol` < s.`__close_epoch`)
           |  OR (s.`__action` = 'insert'
           |     AND t.`$ValidFromCol` = s.`$ValidFromCol`))
           |WHEN MATCHED AND s.`__action` = 'close' THEN UPDATE SET
           |  `$ValidToCol` = s.`__close_epoch`, `$IsCurrentCol` = false
           |WHEN NOT MATCHED AND s.`__action` = 'insert' THEN
           |  INSERT ($insCols) VALUES ($insVals)""".stripMargin
      txn match {
        case Some((app, v)) =>
          graft.sources.arrow.ArrowDataSource
            .withPendingTxn(dimDir, app, v) { spark.sql(merge); () }
        case None => spark.sql(merge); ()
      }
    } finally {
      spark.catalog.dropTempView(view)
      ()
    }
  }
}

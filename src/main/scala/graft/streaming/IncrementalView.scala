package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.sources.arrow.{ArrowChanges, ArrowDataSource, GraftCatalog}

/** Incremental materialized-view maintenance: keep a grouped
  * COUNT/SUM aggregate table in sync with a logged source by applying
  * the source's CHANGE FEED as additive deltas — never re-scanning the
  * source (the materialized-view refresh every warehouse builds over
  * CDC; Delta Live Tables' incremental aggregate shape).
  *
  * Per micro-batch: every change row contributes `+1`/`-1` (insert /
  * delete) times its measure to its group, one hash aggregation nets
  * the batch to per-group deltas (copy-on-write carry-over rows cancel
  * in the signed sum; multi-epoch backlogs telescope — the deltas of
  * epochs `a..b` sum to `agg(V_b) - agg(V_a)` groupwise), and ONE
  * keyed MERGE folds them into the view: existing groups accumulate,
  * groups netting to zero rows are deleted, new groups insert. Refresh
  * cost is O(churned bytes) + O(affected groups), independent of
  * source size: a day of DML against a petabyte fact table maintains
  * its rollup in one small job.
  *
  * Exactly-once: additive deltas must not double-apply when Spark
  * replays a micro-batch (foreachBatch is at-least-once), so each
  * apply commits under a writer-transaction stamp
  * ([[ArrowDataSource.withPendingTxn]]) — the `(appId, batchId)` pair
  * lands atomically inside the view's epoch manifest, and a replayed
  * batch is skipped by the [[ArrowDataSource.lastTxnVersion]] gate
  * before any job runs. This is Delta's idempotent-writer `txn`
  * contract, not convergence-by-key: the gate is exact even though
  * delta application is not idempotent.
  *
  * Maintained aggregates are the self-maintainable ones — COUNT and
  * integral SUMs (cast measures to exact integer units: cents, not
  * double dollars — addition order then cannot drift the state).
  * AVG derives as sum/count at read time. MIN/MAX are NOT
  * self-maintainable under deletes (a retracted minimum needs a
  * group re-scan) and are refused by construction here.
  */
object IncrementalView {

  /** View column layout: `groupCols` as in the source, then `n`
    * (row count), then one LONG column per `(sqlExpr, alias)` sum —
    * `sqlExpr` is evaluated per source row and must be integral. */
  def viewSchema(src: StructType, groupCols: Seq[String],
      sums: Seq[(String, String)]): StructType = {
    val g = groupCols.map(c => src.fields(src.fieldIndex(c)))
    StructType(g ++ (StructField("n", LongType) +:
      sums.map { case (_, a) => StructField(a, LongType) }))
  }

  /** Create an empty view table at `viewDir` if absent (schema from
    * the ENRICHED source's), so the first MERGE has a target to
    * commit into. */
  def ensureView(spark: SparkSession, srcDir: String, viewDir: String,
      groupCols: Seq[String], sums: Seq[(String, String)],
      enrich: DataFrame => DataFrame = identity): Unit = {
    val d = new java.io.File(viewDir)
    val hasData = Option(d.listFiles())
      .exists(_.exists(f => f.getName.endsWith(".arrow") ||
        f.getName == ArrowDataSource.MetadataDirName))
    if (!hasData) {
      val srcSchema =
        enrich(spark.read.format("arrow").load(srcDir)).schema
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        viewSchema(srcSchema, groupCols, sums))
        .coalesce(1)
        .write.format("arrow").mode("overwrite").save(viewDir)
    }
  }

  /** Start maintaining `viewDir` = `SELECT groupCols, COUNT(*) AS n,
    * SUM(expr) AS alias... FROM enrich(srcDir) GROUP BY groupCols` off
    * the source's streaming change feed. `availableNow` drains
    * everything committed at start and stops (batch-style refresh);
    * otherwise the view follows the source continuously.
    *
    * `enrich` extends the self-maintainable family to JOIN VIEWS over
    * immutable dimensions (the classic IVM case): it must be a
    * deterministic per-row 1:1 mapping of each fact row — e.g. a
    * broadcast lookup join to a STATIC dim — so a row's delete change
    * enriches exactly like its insert did and the signed deltas still
    * telescope. A mutating dim would need re-enrichment of untouched
    * fact rows (not expressible as a fact-feed delta) and is out of
    * contract; `_change_type`/`_commit_epoch` must pass through. */
  def maintain(spark: SparkSession, srcDir: String, viewDir: String,
      groupCols: Seq[String], sums: Seq[(String, String)],
      checkpoint: String, startingEpoch: Long = 0L,
      availableNow: Boolean = true,
      enrich: DataFrame => DataFrame = identity): StreamingQuery = {
    require(groupCols.nonEmpty, "incremental view needs group columns")
    if (spark.conf.getOption("spark.sql.catalog.graft").isEmpty)
      spark.conf.set("spark.sql.catalog.graft",
        classOf[GraftCatalog].getName)
    ensureView(spark, srcDir, viewDir, groupCols, sums, enrich)
    // identity = the checkpoint: Spark's batchId sequence is scoped to
    // it, so the stamp's appId must be too (a fresh checkpoint restarts
    // batch numbering AND the replay gate together)
    val appId = "graft_ivm_" + java.util.UUID
      .nameUUIDFromBytes(checkpoint.getBytes("UTF-8")).toString
    val feed = enrich(spark.readStream.format("arrow")
      .option("readChangeFeed", "true")
      .option("startingEpoch", startingEpoch)
      .load(srcDir))
    val writer = feed.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyDelta(batch, viewDir, groupCols, sums, appId, batchId)
        ()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow())
    else writer).start()
  }

  /** The maintained view as a DataFrame. */
  def read(spark: SparkSession, viewDir: String): DataFrame =
    spark.read.format("arrow").load(viewDir)

  private val applySeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Apply one micro-batch of tagged change rows as per-group deltas.
    * Returns false when the replay gate skipped the batch (its
    * `(appId, version)` stamp is already committed to the view log). */
  def applyDelta(batch: DataFrame, viewDir: String,
      groupCols: Seq[String], sums: Seq[(String, String)],
      appId: String, version: Long): Boolean = {
    val spark = batch.sparkSession
    val root = java.nio.file.Paths.get(viewDir).toAbsolutePath.normalize
    if (ArrowDataSource.lastTxnVersion(root, appId).exists(_ >= version))
      return false // replayed micro-batch: already folded in
    val sign = when(col(ArrowChanges.ChangeTypeCol)
        .isin("insert", ArrowChanges.UpdatePostimage), 1L)
      .otherwise(-1L)
    val deltaNames = "__dn" +: sums.map { case (_, a) => s"__d_$a" }
    // coalesce: a batch whose change rows all carry a NULL measure for
    // a group sums to NULL, and `t.sum + NULL` would silently null the
    // accumulated state — NULL measures contribute 0, matching SUM's
    // ignore-NULLs semantics for any group that has at least one
    // non-null value (the view's documented contract: integral units)
    val deltaAggs = sum(sign).as("__dn") +: sums.map {
      case (e, a) =>
        coalesce(sum(sign * expr(e).cast(LongType)), lit(0L))
          .as(s"__d_$a")
    }
    val zero = deltaNames.map(col(_) === 0L).reduce(_ && _)
    val delta = batch
      .groupBy(groupCols.map(col): _*)
      .agg(deltaAggs.head, deltaAggs.tail: _*)
      .filter(!zero) // groups the batch leaves untouched: no-op rows out
    val view = s"graft_ivm_${applySeq.incrementAndGet()}_" +
      java.util.UUID.randomUUID().toString.takeRight(12)
    delta.createOrReplaceTempView(view)
    try {
      val onKeys = groupCols // null-safe: NULL group keys are groups too
        .map(k => s"t.`$k` <=> s.`$k`").mkString(" AND ")
      val setN = s"`n` = t.`n` + s.`__dn`"
      // coalesce(t.*) guards state written before the delta-side
      // coalesce existed (a NULL already in the view must not stay
      // sticky once deltas resume arriving)
      val setSums = sums.map { case (_, a) =>
        s"`$a` = coalesce(t.`$a`, 0) + s.`__d_$a`"
      }
      val insCols = (groupCols ++ Seq("n") ++ sums.map(_._2))
        .map(c => s"`$c`").mkString(", ")
      val insVals = (groupCols.map(c => s"s.`$c`") ++ Seq("s.`__dn`") ++
        sums.map { case (_, a) => s"s.`__d_$a`" }).mkString(", ")
      val merge =
        s"""MERGE INTO graft.arrow.`$viewDir` t
           |USING $view s ON $onKeys
           |WHEN MATCHED AND t.`n` + s.`__dn` <= 0 THEN DELETE
           |WHEN MATCHED THEN UPDATE SET ${(setN +: setSums).mkString(", ")}
           |WHEN NOT MATCHED AND s.`__dn` > 0 THEN
           |  INSERT ($insCols) VALUES ($insVals)""".stripMargin
      // ONE merge = ONE view epoch: the txn stamp, the group updates,
      // the group deletes, and the new groups land in one atomic commit
      ArrowDataSource.withPendingTxn(viewDir, appId, version) {
        spark.sql(merge)
      }
      true
    } finally {
      spark.catalog.dropTempView(view)
      ()
    }
  }
}

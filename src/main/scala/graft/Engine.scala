package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Engine facade mirroring the reference's lifecycle contracts
  * (SURVEY.md §2a):
  *
  *  - R2 errors-as-values (`ErrorWhenEvaluatingExpression[expr, msg]`,
  *    `/root/reference/Source/BOSSArrowStorageEngine.cpp:33-39`) →
  *    [[Engine.evaluate]] returns `Either[EngineError, DataFrame]`, never
  *    throws across the API boundary.
  *  - R4 lazy singleton holding loaded tables
  *    (`/root/reference/Source/BOSSArrowStorageEngine.cpp:44-50`) →
  *    `SparkSession` + temp-view catalog.
  *  - R5 `reset()` dropping all engine state
  *    (`/root/reference/Source/BOSSArrowStorageEngine.cpp:59`) →
  *    [[Engine.reset]] clears cache + temp views.
  */
object Engine {

  /** Structured error value — the query result when evaluation fails. */
  final case class EngineError(expression: String, message: String)

  /** Per-process warehouse path, exit-reaped like every other scratch
    * dir (the session is stopped by then; pid-suffixed, never shared). */
  private lazy val warehouseDir: String = Scratch.dir("warehouse", "wh")

  /** Session defaults shared by Verify / Bench / tests. `nanosAsLong`
    * lets Spark 4 read the fixture `events.parquet` (TIMESTAMP(NANOS),
    * which Spark otherwise rejects); [[Tables.events]] converts back to a
    * microsecond timestamp losslessly. */
  def sessionBuilder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // per-process warehouse: the catalog is in-memory (per JVM) but
      // managed-table directories persist on disk, so a shared path
      // makes every saveAsTable non-idempotent across JVM runs
      // (LOCATION_ALREADY_EXISTS on the next run's CREATE) and lets
      // concurrent JVMs clobber each other's tables; reaped at JVM
      // exit so repeated runs don't accumulate orphaned warehouses
      .config("spark.sql.warehouse.dir", warehouseDir)
      .config("spark.ui.enabled", "false")
      // Long-lived local[N] sessions accumulate two kinds of heap that
      // getRDDStorageInfo (storage_mb) never shows: (a) broadcast /
      // shuffle blocks whose driver-side references are dead but whose
      // ContextCleaner weak-refs only enqueue on a GC — the default
      // periodic-GC interval is 30min, longer than a whole bench run,
      // so cleanup never fires between families; (b) the status-store
      // listener (installed even with the UI disabled) retaining
      // per-execution/stage/task rollups for the default 1000
      // executions — a full 248-query bench issues ~1500. Both showed
      // up as multi-GB "heap with storage 0" at bench family
      // boundaries (round-16 verdict #4); bound them at the source.
      .config("spark.cleaner.periodicGC.interval", "1min")
      .config("spark.sql.ui.retainedExecutions", "20")
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "200")
      .config("spark.ui.retainedTasks", "5000")

  def local(cores: Int = 4): SparkSession = {
    val s = sessionBuilder(s"local[$cores]", cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** R1/R2: evaluate a declared query, reifying any failure as a value
    * instead of letting it escape (the reference's partial-evaluation
    * error contract). */
  def evaluate(spark: SparkSession, sfDir: String, name: String)
      : Either[EngineError, DataFrame] =
    SparkEntry.queries.get(name) match {
      case None => Left(EngineError(name, s"unknown query: $name"))
      case Some(fn) =>
        try Right(fn(spark, sfDir))
        catch { case e: Throwable => Left(EngineError(name, e.toString)) }
    }

  /** R4: load every fixture into the catalog. */
  def register(spark: SparkSession, sfDir: String): Unit =
    Tables.registerAll(spark, sfDir)

  /** R5: drop all engine state (cache + temp views); the session itself
    * survives, mirroring reset() re-creating a fresh engine on next use. */
  def reset(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.catalog.listTables().collect()
      .filter(_.isTemporary)
      .foreach(t => spark.catalog.dropTempView(t.name))
  }
}

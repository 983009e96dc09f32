package graft

import org.apache.spark.sql.SparkSession

/** Registry of the SESSION-SCOPED FIXTURE MEMOS the query objects keep
  * (shingle inverted index, LSH band tables, fitted IVF/PQ codebooks,
  * graph edge sets, corpus counts, quantized-LM term tables): each
  * owner registers one clear callback at object init, and
  * [[evictAll]] clears every memo AND drops the session's cached
  * relations in one stroke.
  *
  * Why this exists (round-15 verdict #1): the memos are individually
  * bounded — one per (session, dataset) — but by the end of a full
  * Bench pass ~17 of them coexisted in the single local[32] heap, and
  * the collective storage pressure inflated the official bench ~1.7×
  * over standalone plan-true timings. Bench now evicts at query-FAMILY
  * boundaries (each family's warm-up rebuilds exactly what it needs),
  * bounding residency to roughly one family's fixtures. Verify and the
  * test suites never evict — for them the memos behave exactly as
  * before.
  *
  * Clearing the maps and clearing the cache must happen TOGETHER: a
  * memoized DataFrame whose cache entry was dropped would silently
  * recompute its whole build pipeline on every downstream consumer —
  * worse than either state alone. */
object FixtureCaches {
  private val clearers =
    new java.util.concurrent.CopyOnWriteArrayList[() => Unit]()

  /** Called once per owning object (at lazy object init — an owner
    * whose init has not run yet has nothing cached to evict). */
  def register(clear: () => Unit): Unit = { clearers.add(clear); () }

  /** Drop every registered memo and every cached relation of the
    * session. Callers must not hold references to previously memoized
    * DataFrames across this call (the query functions never do — they
    * re-enter getOrElseUpdate per invocation). */
  def evictAll(spark: SparkSession): Unit = {
    clearers.forEach(c => c())
    spark.catalog.clearCache()
  }
}

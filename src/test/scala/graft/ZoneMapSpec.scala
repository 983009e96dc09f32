package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Zone-map data skipping in the Arrow source: the writer records
  * per-record-batch min/max in the IPC footer, the scan drops batches
  * no pushed filter can match at PLANNING time. With
  * `maxSplitBytes=1` every surviving batch is its own split, so
  * `rdd.getNumPartitions` counts surviving batches directly. */
class ZoneMapSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  /** Orders sorted by orderkey across 8 batches of 250 — a clustered
    * layout, so a key-range filter overlaps few batches. */
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("zonemap").toString
    Tables.orders(spark, TestSession.Sf)
      .repartition(1)
      .sortWithinPartitions(col("o_orderkey"))
      .write.format("arrow").option("batchRows", 250)
      .mode("overwrite").save(d)
    d
  }

  private def read = spark.read.format("arrow")
    .option("maxSplitBytes", 1).load(dir)

  test("selective range filter plans only the overlapping batches") {
    val all = read
    val total = all.rdd.getNumPartitions
    assert(total >= 4, s"expected multiple batch-splits, got $total")
    val few = read.filter(col("o_orderkey") <= 100)
    assert(few.rdd.getNumPartitions < total,
      s"zone maps pruned nothing: ${few.rdd.getNumPartitions} of $total")
    // and the pruned scan still returns exactly the right rows
    val expected = Tables.orders(spark, TestSession.Sf)
      .filter(col("o_orderkey") <= 100).count()
    assert(few.count() == expected)
  }

  test("filters crossing batch boundaries stay exact") {
    val keys = Tables.orders(spark, TestSession.Sf)
      .orderBy(col("o_orderkey")).select(col("o_orderkey"))
      .collect().map(_.getLong(0))
    // a range straddling the 250-row batch seam
    val (lo, hi) = (keys(240), keys(260))
    val got = read
      .filter(col("o_orderkey") >= lo && col("o_orderkey") <= hi)
      .select(col("o_orderkey")).collect().map(_.getLong(0)).sorted
    val expected = keys.filter(k => k >= lo && k <= hi).sorted
    assert(got.toSeq == expected.toSeq)
  }

  test("equality and double-range predicates prune and stay exact") {
    val one = read.filter(col("o_orderkey") === 1L)
    assert(one.rdd.getNumPartitions <= 1)
    assert(one.count() ==
      Tables.orders(spark, TestSession.Sf)
        .filter(col("o_orderkey") === 1L).count())
    // double column: o_totalprice is unsorted w.r.t. the layout, so
    // pruning may keep everything — but results must be exact
    val cheap = read.filter(col("o_totalprice") < 1000.0)
    assert(cheap.count() ==
      Tables.orders(spark, TestSession.Sf)
        .filter(col("o_totalprice") < 1000.0).count())
  }

  test("impossible predicate plans an empty scan") {
    val none = read.filter(col("o_orderkey") < 0L)
    assert(none.rdd.getNumPartitions == 0)
    assert(none.count() == 0)
  }

  test("zone map round-trips through the footer verbatim") {
    val f = graft.sources.arrow.ArrowDataSource
      .listIpcFiles(dir).head
    val zm = graft.sources.arrow.ArrowDataSource.zoneMap(f)
    assert(zm.isDefined, "writer recorded no zone map")
    val z = zm.get
    assert(z.cols.contains("o_orderkey"))
    // batch stats are true bounds and ordered for the clustered key
    val stats = z.batches.indices
      .flatMap(b => z.stat(b, "o_orderkey"))
      .map { case (mn, mx) => (mn.toLong, mx.toLong) }
    assert(stats.nonEmpty)
    stats.foreach { case (mn, mx) => assert(mn <= mx) }
    assert(stats == stats.sortBy(_._1),
      "clustered write should give monotonically increasing batch ranges")
  }
}

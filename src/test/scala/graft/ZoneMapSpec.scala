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

  test("decimal zone maps prune range/equality predicates and stay " +
      "exact — including through same-scale precision widening") {
    import graft.sources.arrow.ArrowDataSource
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.arrow.GraftCatalog].getName)
    val d = java.nio.file.Files.createTempDirectory("zonemap_dec").toString
    // money column clustered with the key: decimal stats should prune
    Tables.orders(spark, TestSession.Sf)
      .select(col("o_orderkey"),
        expr("CAST(o_orderkey AS DECIMAL(12,2))").as("amt"))
      .repartition(1)
      .sortWithinPartitions(col("o_orderkey"))
      .write.format("arrow").option("batchRows", 250)
      .mode("overwrite").save(d)
    def rd = spark.read.format("arrow")
      .option("maxSplitBytes", 1).load(d)
    val total = rd.rdd.getNumPartitions
    assert(total >= 4, s"expected multiple batch-splits, got $total")
    val few = rd.filter(col("amt") <= expr("CAST(100 AS DECIMAL(12,2))"))
    assert(few.rdd.getNumPartitions < total,
      s"decimal zone maps pruned nothing: " +
        s"${few.rdd.getNumPartitions} of $total")
    val expected = Tables.orders(spark, TestSession.Sf)
      .select(expr("CAST(o_orderkey AS DECIMAL(12,2))").as("amt"))
      .filter(col("amt") <= 100).count()
    assert(few.count() == expected, "decimal pruning dropped rows")
    // widening the declaration keeps the recorded stats valid: the
    // same predicate at decimal(20,6) still prunes and stays exact
    ArrowDataSource.initTableLog(d)
    spark.sql(s"CALL graft.system.widen_column(path => '$d', " +
      "name => 'amt', type => 'decimal(20,2)')").collect()
    val widened = spark.read.format("arrow")
      .option("maxSplitBytes", 1).load(d)
      .filter(col("amt") <= expr("CAST(100 AS DECIMAL(20,2))"))
    assert(widened.rdd.getNumPartitions < total,
      "widened decimal read lost zone-map pruning")
    assert(widened.count() == expected)
  }

  test("string zone maps prune equality, range, IN, and prefix " +
      "predicates in UTF-8 byte order — and stay exact") {
    // clerk-sorted layout: string-clustered batches
    val d = java.nio.file.Files.createTempDirectory("zonemap_str").toString
    val base = Tables.orders(spark, TestSession.Sf)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderstatus"))
    base.repartition(1)
      .sortWithinPartitions(col("o_orderpriority"))
      .write.format("arrow").option("batchRows", 250)
      .mode("overwrite").save(d)
    def rd = spark.read.format("arrow")
      .option("maxSplitBytes", 1).load(d)
    val total = rd.rdd.getNumPartitions
    assert(total >= 4)
    val somePriority = base.orderBy(col("o_orderpriority")).limit(1)
      .collect().head.getString(1)
    // equality on the FIRST clerk overlaps only the leading batch(es)
    val eq = rd.filter(col("o_orderpriority") === somePriority)
    assert(eq.rdd.getNumPartitions < total,
      s"string equality pruned nothing (${eq.rdd.getNumPartitions}/$total)")
    assert(eq.count() == base.filter(col("o_orderpriority") === somePriority).count())
    // range below the minimum clerk prunes everything
    val none = rd.filter(col("o_orderpriority") < somePriority)
    assert(none.rdd.getNumPartitions == 0 ||
      none.rdd.getNumPartitions < total)
    assert(none.count() == 0)
    // IN and StartsWith stay exact under pruning
    val in = rd.filter(col("o_orderpriority").isin(somePriority, "no#such#priority"))
    assert(in.count() ==
      base.filter(col("o_orderpriority") === somePriority).count())
    val prefix = somePriority.take(3)
    val sw = rd.filter(col("o_orderpriority").startsWith(prefix))
    assert(sw.count() ==
      base.filter(col("o_orderpriority").startsWith(prefix)).count())
  }

  test("string zone-map bounds follow UTF-8 byte order where it " +
      "diverges from UTF-16") {
    import spark.implicits._
    // U+FFFD is a single UTF-16 unit (0xFFFD) ABOVE the emoji's lead
    // surrogate (0xD83D), but in UTF-8/code-point order the emoji
    // (U+1F600) sorts ABOVE U+FFFD — bounds computed with Java String
    // comparison would invert these batches' ranges and drop rows
    val d = java.nio.file.Files
      .createTempDirectory("zonemap_utf8").toString
    val vals = Seq("a", "z", "�", "😀", "😁")
    vals.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "s")
      .repartition(1)
      .sortWithinPartitions(col("s")) // Spark sorts in UTF-8 order
      .write.format("arrow").option("batchRows", 1)
      .mode("overwrite").save(d)
    def rd = spark.read.format("arrow")
      .option("maxSplitBytes", 1).load(d)
    assert(rd.rdd.getNumPartitions == 5)
    // rows above U+FFFD are exactly the two emoji
    val above = rd.filter(col("s") > "�")
    assert(above.count() == 2, "UTF-8-order range dropped the emoji")
    // equality on the emoji survives pruning
    assert(rd.filter(col("s") === "😀").count() == 1)
    // and below "b" only "a" remains
    assert(rd.filter(col("s") < "b").count() == 1)
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

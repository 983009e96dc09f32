package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.arrow.{ArrowDataSource, GraftCatalog}

/** SQL `CALL` maintenance procedures through the graft catalog:
  * vacuum / compact / dictionary_encode, each returning a result table
  * so the operator sees what happened. */
class GraftProcedureSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSession.spark
    s.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    s
  }

  test("CALL vacuum deletes sink orphans, reports them, keeps data") {
    val dir = Files.createTempDirectory("proc_vac").toString
    val committed = Paths.get(dir, "part-00000-live.arrow")
    val orphan = Paths.get(dir, "part-00001-orphan.arrow")
    Files.write(committed, Array[Byte](1))
    Files.write(orphan, Array[Byte](2))
    ArrowDataSource.commitEpochManifest(dir, 0L, Seq(committed.toString))
    val res = spark.sql(
      s"CALL graft.system.vacuum(path => '$dir', grace_ms => 0)")
    assert(res.columns.toSeq == Seq("deleted_path"))
    assert(res.collect().map(_.getString(0)).toSeq ==
      Seq(orphan.toString))
    assert(Files.exists(committed) && !Files.exists(orphan))
  }

  test("CALL compact folds splinters and loses nothing") {
    val dir = Files.createTempDirectory("proc_cmp").toString
    val orders = Tables.load(spark, TestSession.Sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    orders.repartition(16).write.format("arrow")
      .mode("overwrite").save(dir)
    val expect = orders.agg(sum(col("o_orderkey"))).collect()(0).getLong(0)
    val res = spark.sql(
      s"CALL graft.system.compact(path => '$dir', " +
        "target_rows => 1000000)").collect()(0)
    assert(res.getLong(0) == 16, s"16 splinters before, got $res")
    assert(res.getLong(1) == 1, s"one compacted file after, got $res")
    val back = spark.read.format("arrow").load(dir)
    assert(back.agg(sum(col("o_orderkey"))).collect()(0).getLong(0)
      == expect, "compaction must not lose or duplicate rows")
    assert(ArrowDataSource.visibleIpcFiles(dir).length == 1)
  }

  test("CALL compact on a PARTITIONED logged table preserves the " +
      "col=value layout (pruning survives maintenance)") {
    val dir = Files.createTempDirectory("proc_cmp_part").toString
    val root = java.nio.file.Paths.get(dir).toAbsolutePath.normalize
    val df = spark.range(4000).selectExpr(
      "id AS k", "id % 4 AS p", "CAST(id AS DOUBLE) AS v")
    df.repartition(8)
      .write.format("arrow").partitionBy("p")
      .mode("overwrite").save(dir)
    spark.sql(s"DELETE FROM graft.arrow.`$dir` WHERE k < 40") // → logged
    val res = spark.sql(
      s"CALL graft.system.compact(path => '$dir', " +
        "target_rows => 1000000)").collect()(0)
    assert(res.getLong(1) <= 4, s"expected ≤1 file per partition, $res")
    val visible = graft.sources.arrow.ArrowDataSource.visibleIpcFiles(dir)
    assert(visible.forall(f => root.relativize(f.toAbsolutePath.normalize)
      .toString.startsWith("p=")),
      s"compaction flattened the partition layout: " +
        visible.map(root.relativize(_)).mkString(", "))
    // pruning still works and the data is exact
    val back = spark.read.format("arrow").load(dir)
    assert(back.count() == 3960)
    assert(back.filter(col("p") === 2).agg(sum(col("k")))
      .collect()(0).getLong(0) ==
      (40L until 4000L).filter(_ % 4 == 2).sum)
  }

  test("CALL compact with partition => compacts ONLY that subtree " +
      "(OPTIMIZE WHERE); other partitions' files are untouched") {
    val dir = Files.createTempDirectory("proc_cmp_sel").toString
    val root = java.nio.file.Paths.get(dir).toAbsolutePath.normalize
    spark.range(4000).selectExpr(
      "id AS k", "id % 4 AS p", "CAST(id AS DOUBLE) AS v")
      .repartition(8)
      .write.format("arrow").partitionBy("p")
      .mode("overwrite").save(dir)
    graft.sources.arrow.ArrowDataSource.initTableLog(dir)
    def filesOf(part: String): Set[String] =
      graft.sources.arrow.ArrowDataSource.visibleIpcFiles(dir)
        .map(f => root.relativize(f.toAbsolutePath.normalize).toString)
        .filter(_.startsWith(part + "/")).toSet
    val p1Before = filesOf("p=1")
    val p2Before = filesOf("p=2")
    assert(p2Before.size > 1, "fixture should splinter p=2")
    val res = spark.sql(
      s"CALL graft.system.compact(path => '$dir', " +
        "target_rows => 1000000, partition => 'p=2')").collect()(0)
    assert(res.getLong(0) == p2Before.size.toLong,
      s"files_before must count ONLY the selected subtree, got $res")
    assert(filesOf("p=2").size == 1, "selected partition not compacted")
    assert(filesOf("p=1") == p1Before,
      "unselected partition's files were rewritten")
    val back = spark.read.format("arrow").load(dir)
    assert(back.count() == 4000)
    assert(back.filter(col("p") === 2).count() == 1000)
    // a selector over a non-partitioned table refuses
    val flat = Files.createTempDirectory("proc_cmp_flat").toString
    spark.range(10).toDF("id").write.format("arrow")
      .mode("overwrite").save(flat)
    val err = intercept[Exception] {
      spark.sql(s"CALL graft.system.compact(path => '$flat', " +
        "partition => 'p=1')").collect()
    }
    TestErrors.assertRefused(err, "no col=value")
  }

  test("CALL compact PRESERVES a uniform sort stamp — the zero-sort " +
      "join property survives OPTIMIZE") {
    import spark.implicits._
    val dir = Files.createTempDirectory("proc_sorted_compact").toString
    // 6 sorted splinter files (range partitioning keeps per-task order)
    (1 to 6000).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .repartitionByRange(6, col("k")).sortWithinPartitions(col("k"))
      .write.format("arrow").option("sortBy", "k")
      .mode("overwrite").save(dir)
    val before = ArrowDataSource.visibleIpcFiles(dir)
    assert(before.length == 6)
    assert(before.forall(f =>
      ArrowDataSource.footerInfo(f).sort.contains("k")))
    spark.sql(s"CALL graft.system.compact(path => '$dir', " +
      "target_rows => 100000)").collect()
    val after = ArrowDataSource.visibleIpcFiles(dir)
    assert(after.length < before.length, "compaction did not fold")
    assert(after.forall(f =>
      ArrowDataSource.footerInfo(f).sort.contains("k")),
      "OPTIMIZE dropped the sort stamp — zero-sort joins degrade")
    assert(spark.read.format("arrow").load(dir).count() == 6000)
    assert(spark.read.format("arrow").load(dir)
      .agg(sum(col("k"))).collect()(0).getLong(0) ==
      (1L to 6000L).sum)
  }

  test("CALL compact with target_bytes sizes output by on-disk block " +
      "bytes and preserves the sort stamp") {
    import spark.implicits._
    val dir = Files.createTempDirectory("proc_bytes_compact").toString
    (1 to 6000).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .repartitionByRange(6, col("k")).sortWithinPartitions(col("k"))
      .write.format("arrow").option("sortBy", "k")
      .mode("overwrite").save(dir)
    val before = ArrowDataSource.visibleIpcFiles(dir)
    assert(before.length == 6)
    // a byte budget larger than the table folds to ONE file
    // (target_bytes takes precedence over the rows default)
    spark.sql(s"CALL graft.system.compact(path => '$dir', " +
      s"target_bytes => ${1L << 40})").collect()
    assert(ArrowDataSource.visibleIpcFiles(dir).length == 1,
      "huge byte budget must fold to one file")
    // a small byte budget splits the rewrite into multiple files, each
    // sized by the budget — and the sort stamp survives either way
    val total = ArrowDataSource.visibleIpcFiles(dir)
      .map(f => ArrowDataSource.footerInfo(f).sizes.sum).sum
    val res = spark.sql(s"CALL graft.system.compact(path => '$dir', " +
      s"target_bytes => ${math.max(1L, total / 4)})").collect()(0)
    val after = ArrowDataSource.visibleIpcFiles(dir)
    assert(after.length >= 3 && after.length <= 6,
      s"quarter-byte budget should yield ~4 files, got ${after.length}")
    assert(res.getLong(1) == after.length.toLong)
    assert(after.forall(f =>
      ArrowDataSource.footerInfo(f).sort.contains("k")),
      "bytes-targeted OPTIMIZE dropped the sort stamp")
    assert(spark.read.format("arrow").load(dir)
      .agg(sum(col("k"))).collect()(0).getLong(0) == (1L to 6000L).sum)
  }

  test("CALL analyze(histogram => true) persists equi-height " +
      "histograms and the scan serves them to the optimizer") {
    import spark.implicits._
    val dir = Files.createTempDirectory("proc_analyze_hist").toString
    // heavy skew: value 1 holds half the rows; a flat NDV assumes
    // uniformity and cannot tell the hot key from a rare one. The date
    // column pins the temporal domain mapping (days since epoch — the
    // estimator's internal-value space)
    (1 to 2000).map(i =>
      (if (i % 2 == 0) 1L else i.toLong, s"v$i",
        java.sql.Date.valueOf(java.time.LocalDate
          .of(2024, 1, 1).plusDays(i % 100))))
      .toDF("k", "v", "d")
      .coalesce(2)
      .write.format("arrow").mode("overwrite").save(dir)
    spark.sql(s"CALL graft.system.analyze(path => '$dir', " +
      "cols => 'k,d', histogram => true, buckets => 8)").collect()
    val hists = graft.sources.arrow.ColumnStatsFile.loadHistograms(
      java.nio.file.Paths.get(dir).toAbsolutePath.normalize)
    val h = hists.getOrElse("k", fail("no histogram persisted for k"))
    assert(h.bins.length == 8, s"8 bins requested, got ${h.bins.length}")
    assert(math.abs(h.height - 250.0) < 1e-9,
      s"equi-height of 2000 rows / 8 bins is 250, got ${h.height}")
    // equi-height under skew: the hot value's bins are NARROW (the
    // first half of the mass sits at k=1) and carry tiny NDVs, while
    // the tail bins are wide with NDV ≈ height
    assert(h.bins.head._1 <= 1.0 && h.bins.head._3 <= 4,
      s"hot-key bin should be narrow/low-ndv: ${h.bins.head}")
    assert(h.bins.last._3 > 100,
      s"tail bin should hold ~height distinct values: ${h.bins.last}")
    // the date histogram lives in the estimator's days-since-epoch
    // domain: every endpoint sits inside the fixture's date range
    // [2024-01-01, 2024-01-01 + 99 days]
    val hd = hists.getOrElse("d", fail("no histogram persisted for d"))
    val lo = java.time.LocalDate.of(2024, 1, 1).toEpochDay.toDouble
    val hi = lo + 99.0
    assert(hd.bins.head._1 >= lo && hd.bins.last._2 <= hi,
      s"date histogram out of the days domain [$lo,$hi]: " +
        s"${hd.bins.head} .. ${hd.bins.last}")
    // the histogram reaches Catalyst's ColumnStat with CBO on
    val prev = spark.conf.get("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val byName = spark.read.format("arrow").load(dir)
        .queryExecution.optimizedPlan.stats.attributeStats
        .map { case (a, s) => a.name -> s }
      val cs = byName.getOrElse("k", fail(s"no stats for k: $byName"))
      assert(cs.histogram.isDefined,
        s"histogram missing from plan ColumnStat: $cs")
      assert(cs.histogram.get.bins.length == 8)
    } finally spark.conf.set("spark.sql.cbo.enabled", prev)
  }

  test("CALL dictionary_encode rewrites with default args applied") {
    val in = Files.createTempDirectory("proc_dict_in").toString
    val out = Files.createTempDirectory("proc_dict_out").toString
    Tables.load(spark, TestSession.Sf, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"))
      .repartition(2).write.format("arrow").mode("overwrite").save(in)
    val res = spark.sql(
      s"CALL graft.system.dictionary_encode(in_path => '$in', " +
        s"out_path => '$out')").collect()(0)
    assert(res.getLong(0) == 2, s"2 files rewritten, got $res")
    val a = spark.read.format("arrow").load(in)
    val b = spark.read.format("arrow").load(out)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "encode is a pure layout change")
  }

  test("CALL zorder clusters two dimensions so box queries skip " +
      "batches a linear layout must read") {
    // 200×200 grid, one row per cell: a layout sorted by x alone
    // scatters every y across every batch, so an (x,y) box must open
    // every batch its x-range touches; the morton rewrite packs boxes.
    val grid = spark.range(0, 40000).selectExpr(
      "id % 200 AS x", "CAST(id / 200 AS BIGINT) AS y", "id AS payload")
    val linear = Files.createTempDirectory("proc_zlin").toString
    grid.orderBy(col("x"), col("y")).coalesce(1)
      .write.format("arrow").option("batchRows", "256")
      .mode("overwrite").save(linear)
    val zed = Files.createTempDirectory("proc_zed").toString
    grid.write.format("arrow").mode("overwrite").save(zed)
    spark.sql(s"CALL graft.system.zorder(path => '$zed', " +
      "cols => 'x,y', target_rows => 40000)")
    // re-land with the same batch size for comparable granularity
    val zedSmall = Files.createTempDirectory("proc_zed2").toString
    spark.read.format("arrow").load(zed).coalesce(1)
      .write.format("arrow")
      .option("batchRows", "256").mode("overwrite").save(zedSmall)
    def batchesFor(dir: String): Long = {
      val box = spark.read.format("arrow").load(dir)
        .filter(col("x").between(10, 30) && col("y").between(10, 30))
      val before = ArrowDataSource.recordBatchesLoaded.get()
      assert(box.count() == 21L * 21L)
      ArrowDataSource.recordBatchesLoaded.get() - before
    }
    val (lin, z) = (batchesFor(linear), batchesFor(zedSmall))
    assert(z * 2 < lin,
      s"z-ordered box query must load fewer batches: z=$z linear=$lin")
    // and the rewrite lost nothing
    val back = spark.read.format("arrow").load(zed)
    assert(back.count() == 40000)
    assert(back.agg(sum(col("payload"))).collect()(0).getLong(0) ==
      grid.agg(sum(col("payload"))).collect()(0).getLong(0))
  }

  test("CALL history lists committed epochs; flat dirs refuse") {
    val dir = Files.createTempDirectory("proc_hist").toString
    val f0 = Paths.get(dir, "part-00000-e0.arrow")
    val f1 = Paths.get(dir, "part-00000-e1.arrow")
    val f2 = Paths.get(dir, "part-00001-e1.arrow")
    Files.write(f0, Array[Byte](1, 2, 3))
    Files.write(f1, Array[Byte](4))
    Files.write(f2, Array[Byte](5, 6))
    ArrowDataSource.commitEpochManifest(dir, 0L, Seq(f0.toString))
    ArrowDataSource.commitEpochManifest(dir, 1L,
      Seq(f1.toString, f2.toString))
    // detail: one-row operational summary over the same sink
    val detail = spark.sql(s"CALL graft.system.detail(path => '$dir')")
      .collect()(0)
    assert(detail.getAs[Long]("files") == 3 &&
      detail.getAs[Long]("bytes") == 6 &&
      detail.getAs[Long]("epochs") == 1 &&
      detail.getAs[Long]("dv_files") == 0 &&
      !detail.getAs[Boolean]("dv_enabled"),
      s"detail row wrong: $detail")
    val hist = spark.sql(s"CALL graft.system.history(path => '$dir')")
    val rows = hist.select(col("epoch"), col("files"), col("bytes"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq((0L, 1L, 3L), (1L, 2L, 3L)))
    // commit wall-clock stamps are attributed and non-decreasing
    val ts = hist.orderBy(col("epoch")).select(col("commit_ts"))
      .collect().map(_.getTimestamp(0))
    assert(ts.forall(_ != null), "missing commit_ts")
    assert(ts.sliding(2).forall(p => !p(1).before(p(0))),
      "commit stamps not monotone")
    val flat = Files.createTempDirectory("proc_hist_flat").toString
    val e = intercept[Exception] {
      spark.sql(s"CALL graft.system.history(path => '$flat')").collect()
    }
    TestErrors.assertRefused(e, "commit log")
  }

  test("CALL analyze persists NDVs and the scan serves distinctCount " +
      "to the optimizer's column statistics") {
    import spark.implicits._
    val dir = Files.createTempDirectory("proc_analyze").toString
    (1 to 1000).map(i => (i.toLong, (i % 7).toLong, s"v${i % 13}"))
      .toDF("id", "grp", "tag")
      .coalesce(2)
      .write.format("arrow").mode("overwrite").save(dir)
    val res = spark.sql(s"CALL graft.system.analyze(path => '$dir')")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // approx_count_distinct is within a few percent at these scales
    assert(math.abs(res("id") - 1000L) <= 50, s"id ndv ${res("id")}")
    assert(res("grp") == 7L && res("tag") == 13L, s"$res")
    // the NDVs reach Catalyst: with CBO on, attributeStats carry them
    val prev = spark.conf.get("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val stats = spark.read.format("arrow").load(dir)
        .queryExecution.optimizedPlan.stats
      val byName = stats.attributeStats.map { case (a, s) =>
        a.name -> s
      }
      assert(byName.get("grp").exists(_.distinctCount
        .contains(BigInt(7))),
        s"grp distinctCount missing from plan stats: $byName")
    } finally spark.conf.set("spark.sql.cbo.enabled", prev)
  }

  test("CALL partitions rolls up files/bytes/rows per value dir, " +
      "deletion-vector-adjusted, from metadata alone") {
    import spark.implicits._
    val dir = Files.createTempDirectory("proc_parts").toString
    (1 to 90).map(i => (i.toLong, s"p${i % 3}")).toDF("id", "part")
      .write.format("arrow").partitionBy("part")
      .option("optimizeWrite", "true").mode("overwrite").save(dir)
    ArrowDataSource.initTableLog(dir)
    spark.sql(s"CALL graft.system.set_dv(path => '$dir')").collect()
    spark.sql(s"DELETE FROM graft.arrow.`$dir` " +
      "WHERE part = 'p1' AND id <= 31") // masks ids 1,4,...,31: 11 rows
    val loads = ArrowDataSource.recordBatchesLoaded.get()
    val rows = spark.sql(s"CALL graft.system.partitions(path => '$dir')")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.get(3))).toMap
    assert(ArrowDataSource.recordBatchesLoaded.get() == loads,
      "partitions() read data batches — must be metadata-only")
    assert(rows.keySet == Set("part=p0", "part=p1", "part=p2"))
    assert(rows("part=p0")._2 == 30L && rows("part=p2")._2 == 30L)
    assert(rows("part=p1")._2 == 19L,
      s"dv-masked partition row count wrong: ${rows("part=p1")}")
    // a partition-SUBDIRECTORY path must honor the table's log and
    // vectors (sinkRoot climbs out of the col=value segment)
    val sub = spark.sql(
      s"CALL graft.system.partitions(path => '$dir/part=p1')")
      .collect()
    assert(sub.length == 1 && sub(0).getLong(3) == 19L,
      s"subdirectory partitions() lost the vector adjustment: " +
        s"${sub.toSeq}")
    val subDetail = spark.sql(
      s"CALL graft.system.detail(path => '$dir/part=p1')").collect()(0)
    assert(subDetail.getAs[Long]("rows") == 19L &&
      subDetail.getAs[Long]("epochs") > 0,
      s"subdirectory detail() wrong: $subDetail")
  }

  test("an unknown procedure names the available ones") {
    val e = intercept[Exception] {
      spark.sql("CALL graft.system.no_such_proc()")
    }
    val messages = TestErrors.messages(e).mkString("; ")
    assert(messages.contains("vacuum") && messages.contains("compact"),
      s"error chain must list procedures, got: $messages")
  }
}

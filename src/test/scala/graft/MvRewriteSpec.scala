package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.MaterializedViews
import graft.sources.arrow.{ArrowDataSource, GraftCatalog}

/** Materialized-view query rewrite ([[graft.plans
  * .RewriteToMaterializedView]]): a registered maintained view answers
  * the exact aggregate it maintains; staleness (any new source epoch)
  * disarms the rewrite until the next refresh; non-matching shapes
  * fall through untouched. */
class MvRewriteSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSession.spark
    s.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    s
  }

  private def agg(src: String): DataFrame =
    spark.read.format("arrow").load(src)
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("cnt"), sum(col("amt")).as("s"))
      .orderBy(col("grp"))

  private def usesView(df: DataFrame, view: String): Boolean =
    df.queryExecution.optimizedPlan.toString.contains(
      java.nio.file.Paths.get(view).toAbsolutePath.normalize.toString)

  test("fresh view answers the aggregate; staleness disarms; refresh " +
      "re-arms; other shapes untouched") {
    import spark.implicits._
    val src = Files.createTempDirectory("mv_src").toString
    val view = Files.createTempDirectory("mv_view").toString
    val ckpt = Files.createTempDirectory("mv_ckpt").toString
    try {
      (1L to 90L).map(i => (i, "g" + (i % 3), i * 10L))
        .toDF("id", "grp", "amt")
        .repartition(2)
        .write.format("arrow").mode("overwrite").save(src)
      ArrowDataSource.initTableLog(src)
      MaterializedViews.refreshAndRegister(spark, src, view,
        groupCols = Seq("grp"), sums = Seq(("amt", "sum_amt")),
        checkpoint = ckpt)

      val q1 = agg(src)
      assert(usesView(q1, view),
        s"rewrite did not fire:\n${q1.queryExecution.optimizedPlan}")
      val r1 = q1.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(r1 == Seq(("g0", 30L, (3L to 90L by 3).map(_ * 10).sum),
        ("g1", 30L, (1L to 88L by 3).map(_ * 10).sum),
        ("g2", 30L, (2L to 89L by 3).map(_ * 10).sum)))

      // staleness: one DML epoch disarms the rewrite and the answer
      // reflects the new data immediately
      spark.sql(s"DELETE FROM graft.arrow.`$src` WHERE grp = 'g0'")
      val q2 = agg(src)
      assert(!usesView(q2, view),
        "stale view must NOT answer the aggregate")
      assert(q2.collect().length == 2)

      // refresh re-arms
      MaterializedViews.refreshAndRegister(spark, src, view,
        groupCols = Seq("grp"), sums = Seq(("amt", "sum_amt")),
        checkpoint = ckpt)
      val q3 = agg(src)
      assert(usesView(q3, view), "refreshed view should answer again")
      val r3 = q3.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(r3 == Seq(("g1", 30L, (1L to 88L by 3).map(_ * 10).sum),
        ("g2", 30L, (2L to 89L by 3).map(_ * 10).sum)))

      // a filtered aggregate is a different query: no rewrite, exact
      val filtered = spark.read.format("arrow").load(src)
        .filter(col("id") > 50L)
        .groupBy(col("grp")).agg(count(lit(1)).as("cnt"))
      assert(!usesView(filtered, view))
      assert(filtered.collect().map(_.getLong(1)).sum ==
        (51L to 90L).count(_ % 3 != 0))

      // an unregistered aggregate shape (different measure) falls back
      val otherSum = spark.read.format("arrow").load(src)
        .groupBy(col("grp")).agg(sum(col("id")).as("s"))
      assert(!usesView(otherSum, view))
    } finally MaterializedViews.clear()
  }

  test("the rewrite fires under surrounding operators (HAVING) and " +
      "for partial consumption (sum only)") {
    import spark.implicits._
    val src = Files.createTempDirectory("mvh_src").toString
    val view = Files.createTempDirectory("mvh_view").toString
    val ckpt = Files.createTempDirectory("mvh_ckpt").toString
    try {
      (1L to 60L).map(i => (i, "g" + (i % 4), i))
        .toDF("id", "grp", "amt")
        .write.format("arrow").mode("overwrite").save(src)
      ArrowDataSource.initTableLog(src)
      MaterializedViews.refreshAndRegister(spark, src, view,
        groupCols = Seq("grp"), sums = Seq(("amt", "sum_amt")),
        checkpoint = ckpt)
      // HAVING = Filter above the Aggregate: the child aggregate still
      // rewrites, the filter applies to the view-served values
      spark.read.format("arrow").load(src)
        .createOrReplaceTempView("mvh_base")
      val having = spark.sql(
        "SELECT grp, COUNT(*) AS cnt, SUM(amt) AS s FROM mvh_base " +
          "GROUP BY grp HAVING SUM(amt) > 450 ORDER BY grp")
      assert(usesView(having, view),
        s"HAVING blocked the rewrite:\n${having.queryExecution.optimizedPlan}")
      val expect = (1L to 60L).groupBy(i => "g" + (i % 4))
        .map { case (g, is) => (g, is.size.toLong, is.sum) }
        .filter(_._3 > 450).toSeq.sortBy(_._1)
      assert(having.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toSeq == expect)
      // partial consumption: only the sum, no count
      val sumOnly = spark.read.format("arrow").load(src)
        .groupBy(col("grp")).agg(sum(col("amt")).as("s"))
        .orderBy(col("grp"))
      assert(usesView(sumOnly, view))
      assert(sumOnly.collect().map(_.getLong(1)).sum == (1L to 60L).sum)
    } finally MaterializedViews.clear()
  }

  test("time-travel and change-feed aggregates are NEVER answered by " +
      "the view; NULL group keys survive the rollup rewrite") {
    import spark.implicits._
    val src = Files.createTempDirectory("mvtt_src").toString
    val view = Files.createTempDirectory("mvtt_view").toString
    val ckpt = Files.createTempDirectory("mvtt_ckpt").toString
    try {
      // grp has a genuine NULL group; the finer view keys on (grp, pg)
      (1L to 60L).map(i =>
          (i, if (i % 5 == 0) null else "g" + (i % 2), "p" + (i % 2), i))
        .toDF("id", "grp", "pg", "amt")
        .write.format("arrow").mode("overwrite").save(src)
      ArrowDataSource.initTableLog(src)
      spark.sql(s"DELETE FROM graft.arrow.`$src` WHERE id > 50") // epoch 1
      MaterializedViews.refreshAndRegister(spark, src, view,
        groupCols = Seq("grp", "pg"), sums = Seq(("amt", "sum_amt")),
        checkpoint = ckpt)
      // current-state rollup: rewritten, NULL group intact
      val byGrp = spark.read.format("arrow").load(src)
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("cnt"), sum(col("amt")).as("s"))
      assert(usesView(byGrp, view))
      val got = byGrp.collect().map(r =>
        (if (r.isNullAt(0)) null else r.getString(0), r.getLong(1)))
        .toMap
      assert(got(null) == (1L to 50L).count(_ % 5 == 0),
        s"NULL group corrupted by the rewrite: $got")
      assert(got.values.sum == 50L)
      // a TIME-TRAVEL aggregate answers from the historical snapshot,
      // never the (current-state) view
      val old = spark.read.format("arrow")
        .option("epochAsOf", "0").load(src)
        .agg(count(lit(1)).as("cnt"))
      assert(!usesView(old, view),
        "epochAsOf aggregate was answered by the current-state view")
      assert(old.head.getLong(0) == 60L)
      // a CHANGE-FEED aggregate is a different multiset entirely
      val feed = spark.read.format("arrow")
        .option("readChangeFeed", "true").option("startingEpoch", "0")
        .load(src)
        .groupBy(col("grp")).agg(count(lit(1)).as("cnt"))
      assert(!usesView(feed, view),
        "change-feed aggregate was answered by the table-state view")
    } finally MaterializedViews.clear()
  }

  test("coarser groupings ROLL UP from the view, including the global " +
      "aggregate; a superset grouping falls through") {
    import spark.implicits._
    val src = Files.createTempDirectory("mvr_src").toString
    val view = Files.createTempDirectory("mvr_view").toString
    val ckpt = Files.createTempDirectory("mvr_ckpt").toString
    try {
      (1L to 120L).map(i => (i, "g" + (i % 3), "p" + (i % 2), i * 7L))
        .toDF("id", "grp", "pg", "amt")
        .repartition(2)
        .write.format("arrow").mode("overwrite").save(src)
      ArrowDataSource.initTableLog(src)
      // view at the FINER grain (grp, pg)
      MaterializedViews.refreshAndRegister(spark, src, view,
        groupCols = Seq("grp", "pg"), sums = Seq(("amt", "sum_amt")),
        checkpoint = ckpt)
      // coarser: by grp only
      val byGrp = spark.read.format("arrow").load(src)
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("cnt"), sum(col("amt")).as("s"))
        .orderBy(col("grp"))
      assert(usesView(byGrp, view),
        s"rollup did not fire:\n${byGrp.queryExecution.optimizedPlan}")
      val expect = (1L to 120L).groupBy(i => "g" + (i % 3))
        .map { case (g, is) => (g, is.size.toLong, is.map(_ * 7L).sum) }
        .toSeq.sortBy(_._1)
      assert(byGrp.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toSeq == expect)
      // global
      val global = spark.read.format("arrow").load(src)
        .agg(count(lit(1)).as("cnt"), sum(col("amt")).as("s"))
      assert(usesView(global, view))
      val g = global.collect().head
      assert(g.getLong(0) == 120L && g.getLong(1) == (1L to 120L).map(_ * 7L).sum)
      // a SUPERSET grouping (finer than the view) cannot be answered
      val finer = spark.read.format("arrow").load(src)
        .groupBy(col("grp"), col("pg"), col("id"))
        .agg(count(lit(1)).as("cnt"))
      assert(!usesView(finer, view))
      assert(finer.count() == 120)
    } finally MaterializedViews.clear()
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke-level invariants for every declared query: runs on sf0.001,
  * returns rows, and its oracle entry (if any) references only fixture
  * tables. The deep correctness gate is the driver's DuckDB compare
  * (tools/parity.py locally). */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys are a subset of query keys") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracle entries without queries: $unknown")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name returns rows on sf0.001") {
      val df = fn(spark, TestSession.Sf)
      // scale guard on the WHOLE declared surface: no unpartitioned
      // window over unbounded input (the single-reducer collapse)
      val globalWindows =
        PlanGuards.unpartitionedWindows(df.queryExecution.executedPlan)
      assert(globalWindows.isEmpty,
        s"$name plans a global window over unbounded input: " +
          globalWindows.mkString(", "))
      val n = df.count()
      // set_intersect legitimately can be small; everything must be >= 0
      // and the bulk of queries must produce data.
      assert(n >= 0)
      if (!Set("set_intersect", "dedup_jaccard", "dedup_jaccard_dfcut",
        "dedup_minhash", "dedup_incremental",
        "dedup_simhash", "sim_cosine_neardup", "dedup_cluster",
        "text_decontam", "q7_volume_shipping").contains(name)) {
        assert(n > 0, s"$name returned no rows")
      }
    }
  }

  test("percentile_approx lands near the exact percentile") {
    import org.apache.spark.sql.functions._
    val both = Tables.lineitem(spark, TestSession.Sf)
      .agg(
        expr("percentile(l_extendedprice, 0.5)").as("exact"),
        expr("percentile_approx(l_extendedprice, 0.5, 1000)").as("approx"))
      .head
    val (exact, approx) = (both.getDouble(0), both.getDouble(1))
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx $approx vs exact $exact")
  }

  test("markov ppm normalization survives counts past 2^31 without " +
      "Long wraparound") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // n * 1e6 in LongType wraps past ~9.2e12; the DECIMAL(38,0) path
    // must keep exact ppm for counts a 100 TB stream can reach
    val big = 10_000_000_000_000L // 1e13 transitions on one pair
    val counts = Seq(("a", "b", big), ("a", "c", big * 3))
      .toDF("s1", "s2", "n")
    val out = graft.queries.FunnelQueries.markovPpm(counts)
      .collect().map(r => (r.getString(1), r.getLong(3))).toMap
    assert(out == Map("b" -> 250000L, "c" -> 750000L),
      s"ppm wrapped or misdivided: $out")
  }

  test("q1 aggregates match a hand-computed slice") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("q1_pricing_summary")(spark, TestSession.Sf)
    val li = Tables.lineitem(spark, TestSession.Sf)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
    val expected = li.count()
    val got = df.agg(sum(col("count_order"))).head.getLong(0)
    assert(got == expected)
  }
}

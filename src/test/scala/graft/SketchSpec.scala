package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketch/approximation family beyond HLL (which QueriesSpec bounds via
  * agg_approx_distinct): count-min frequency estimates and the
  * frequent-items sketch. Error bounds are probabilistic → spec-checked
  * against exact counts, not oracle queries. */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("count_min_sketch estimates every flag count within eps*N") {
    val li = Tables.lineitem(spark, TestSession.Sf)
    val exact = li.groupBy(col("l_returnflag")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val eps = 0.01
    val sketchBytes = li.agg(
      expr(s"count_min_sketch(l_returnflag, ${eps}d, 0.99d, 42)"))
      .head.getAs[Array[Byte]](0)
    val sketch = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sketchBytes))
    exact.foreach { case (flag, cnt) =>
      // the SQL aggregate inserts UTF8String payload bytes
      val est = sketch.estimateCount(flag.getBytes("UTF-8"))
      assert(est >= cnt, s"CMS under-counted $flag: $est < $cnt")
      assert(est <= cnt + (eps * n).toLong,
        s"CMS over-counted $flag beyond bound: $est vs $cnt (N=$n)")
    }
  }

  test("the DECLARED agg_approx_distinct lands within the configured " +
      "rsd band of the exact per-group distinct count") {
    // agg_approx_distinct is now HARD-GATED in CORRECTNESS (the query
    // emits exact_orders + within_rsd and the oracle states the band
    // verdict); this spec pins the same contract in-process: every
    // group present, every within_rsd bit set, exact counts matching
    // a direct countDistinct. rsd 0.02 → 3σ (6%) band inside the query.
    val out = SparkEntry.queries("agg_approx_distinct")(
      spark, TestSession.Sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    val exact = Tables.lineitem(spark, TestSession.Sf)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet == exact.keySet)
    exact.foreach { case (flag, n) =>
      val (e, within) = out(flag)
      assert(e == n, s"agg_approx_distinct($flag) exact_orders $e != $n")
      assert(within == 1,
        s"agg_approx_distinct($flag): estimate outside 3×rsd band")
    }
  }

  test("the DECLARED agg_hll_rollup merged estimate lands within the " +
      "sketch's rsd band of the exact per-priority distinct count") {
    // Default Datasketches lgK=12 → rsd ≈ 1.04/√4096 ≈ 1.6%; the query
    // bands the merged estimate at 5% (≈3σ) and emits the verdict bit
    // the oracle now hash-gates. SketchSpec's union test already
    // proves merge losslessness bit-for-bit; this ties the declared
    // query's band bit + exact counts to ground truth in-process.
    val out = SparkEntry.queries("agg_hll_rollup")(
      spark, TestSession.Sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getInt(3)))).toMap
    val exact = Tables.orders(spark, TestSession.Sf)
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet == exact.keySet)
    exact.foreach { case (prio, n) =>
      val (e, within) = out(prio)
      assert(e == n, s"agg_hll_rollup($prio) exact_cust $e != $n")
      assert(within == 1,
        s"agg_hll_rollup($prio): merged estimate outside rsd band")
    }
  }

  test("HLL sketch union of monthly partials equals the global sketch") {
    val o = Tables.orders(spark, TestSession.Sf)
    // two-level: per-month sketches merged per priority
    val merged = queries.AggQueries.hllRollup(spark, TestSession.Sf)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // one-level: a single sketch straight over the rows
    val direct = o.groupBy(col("o_orderpriority"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(o_custkey))").as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // register-wise max is associative: pre-aggregation is lossless
    assert(merged == direct)
    val exact = o.groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(merged(k) - n).toDouble <= math.max(4.0, 0.05 * n),
        s"HLL estimate off for $k: ${merged(k)} vs exact $n")
    }
  }

  test("freqItems returns a superset of the truly frequent values") {
    val o = Tables.orders(spark, TestSession.Sf)
    val support = 0.15
    val found = o.stat.freqItems(Array("o_orderstatus"), support)
      .head.getSeq[String](0).toSet
    val n = o.count()
    val trulyFrequent = o.groupBy(col("o_orderstatus")).count()
      .filter(col("count") > n * support)
      .collect().map(_.getString(0)).toSet
    assert(trulyFrequent.subsetOf(found),
      s"missing frequent items: ${trulyFrequent diff found}")
  }

  test("the DECLARED agg_heavy_hitters equals the sketch-free exact plan") {
    val sf = "/root/testdata/sf0.01"
    val declared = queries.AggQueries.heavyHitters(spark, sf).collect().toSeq
    // ground truth: full-domain groupBy with the same integer threshold,
    // no candidate sketch anywhere
    val toks = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("token"))
    val n = toks.count()
    val exact = toks.groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit(100L) > lit(n) * lit(3L))
      .orderBy(col("cnt").desc, col("token")).collect().toSeq
    assert(declared == exact)
    assert(declared.nonEmpty, "fixture produced no heavy hitters")
  }
}

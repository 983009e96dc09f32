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
    // two-level: per-month sketches merged per priority (the declared
    // query's shape, recomputed here because the query now emits the
    // hash-gated exact+band columns, not the raw estimate)
    val merged = o.groupBy(col("o_orderpriority"),
        date_trunc("month", col("o_orderdate")).as("m"))
      .agg(expr("hll_sketch_agg(o_custkey)").as("sk"))
      .groupBy(col("o_orderpriority"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
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

  test("bottom-k quantile sketch: monthly partials re-truncate to the " +
      "EXACT global sample, and the median estimate's true rank sits " +
      "in the sample-size band") {
    val o = Tables.orders(spark, TestSession.Sf)
      .select(col("o_orderpriority"), col("o_orderkey"),
        date_trunc("month", col("o_orderdate")).as("m"))
      .withColumn("h",
        col("o_orderkey") % lit(2147483648L) * lit(2654435761L)
          % lit(4294967296L))
    val k = 256
    // one-level: global bottom-k by hash per priority
    val wG = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderpriority"))
      .orderBy(col("h"), col("o_orderkey"))
    val global = o.withColumn("rk", row_number().over(wG))
      .filter(col("rk") <= k)
      .select(col("o_orderpriority"), col("o_orderkey"))
    // two-level: per-month bottom-k, union, re-truncate
    val wM = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderpriority"), col("m"))
      .orderBy(col("h"), col("o_orderkey"))
    val twoLevel = o.withColumn("rk", row_number().over(wM))
      .filter(col("rk") <= k)
      .withColumn("rk2", row_number().over(wG))
      .filter(col("rk2") <= k)
      .select(col("o_orderpriority"), col("o_orderkey"))
    // bottom-k is a semilattice: the merge is LOSSLESS, not just close
    assert(global.exceptAll(twoLevel).isEmpty &&
      twoLevel.exceptAll(global).isEmpty,
      "two-level bottom-k diverged from the global sample")
    // the declared query's estimate rank: sample of ~256 → rank sd
    // ≈ √(p(1-p)/k) ≈ 3.1% of n at the median; 3σ ≈ 9.4%, pin at 10%
    SparkEntry.queries("agg_quantile_sketch")(spark, TestSession.Sf)
      .collect().foreach { r =>
        val n = r.getLong(1).toDouble
        val rank = r.getLong(4).toDouble
        assert(math.abs(rank - 0.5 * n) <= 0.10 * n,
          s"median estimate rank off for ${r.getString(0)}: " +
            s"$rank of $n")
      }
  }

  test("KMV intersection: the declared estimate lands in-band against " +
      "the exact intersection, and a LOCAL re-computation of the " +
      "estimator from the collected samples agrees") {
    // the declared row's band bit must be ON (exact + in-band is the
    // hash gate's whole contract)
    val row = SparkEntry.queries("agg_sketch_intersection")(
      spark, TestSession.Sf).collect().head
    val (nA, nB, exact, band) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getInt(3))
    assert(band == 1, s"estimate out of band: exact=$exact")
    assert(exact > 0 && exact <= math.min(nA, nB))
    // independent local KMV: hash every custkey per side the same way,
    // take bottom-k locally, apply the estimator — the distributed
    // two-level sample must be the SAME sample (semilattice), so the
    // local estimate must agree with what the in-band bit certified
    val K = 256
    val M = 4294967296L
    def h(c: Long) = {
      val p = ((c % 2147483648L) + 2147483648L) % 2147483648L
      p * 2654435761L % 4294967296L
    }
    val bySide = Tables.orders(spark, TestSession.Sf)
      .filter(col("o_orderstatus").isin("O", "F"))
      .select(col("o_orderstatus"), col("o_custkey"))
      .distinct().collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val a = bySide("O").toSeq.sortBy(c => (h(c), c)).take(K)
    val b = bySide("F").toSeq.sortBy(c => (h(c), c)).take(K)
    val thetaA = if (bySide("O").size >= K) h(a.last) else M
    val thetaB = if (bySide("F").size >= K) h(b.last) else M
    val theta = math.min(thetaA, thetaB)
    val c = (a.toSet intersect b.toSet).count(k => h(k) <= theta)
    val est = c.toDouble * M / theta
    val trueInter = (bySide("O") intersect bySide("F")).size
    assert(trueInter == exact,
      s"exact pass disagreed with the local ground truth: " +
        s"$exact vs $trueInter")
    assert(math.abs(est - exact) <= math.max(16.0, exact * 0.25),
      s"local KMV estimate out of the declared band: est=$est " +
        s"exact=$exact (c=$c theta=$theta)")
  }

  test("KMV intersection on seeded RANDOM universes: the exact pass " +
      "matches the constructed truth, the distributed estimate equals " +
      "a local re-derivation, and error stays within the sample-size " +
      "bound at every overlap level") {
    import spark.implicits._
    val M = 4294967296L
    def h(c: Long) = {
      val p = ((c % 2147483648L) + 2147483648L) % 2147483648L
      p * 2654435761L % 4294967296L
    }
    var relErrs = List.empty[Double]
    for (seed <- Seq(7L, 8675309L); overlap <- Seq(0.1, 0.5, 0.9)) {
      val rnd = new scala.util.Random(seed)
      val nEach = 1500 + rnd.nextInt(1000)
      val nShared = (nEach * overlap).toInt
      // keys drawn sparse so the Knuth hash sees a realistic domain;
      // the second seed draws NEGATIVE keys too (signed ids exist in
      // the wild — the pmod fold must stay a uniform sample there)
      def freshKey() =
        if (seed == 8675309L) rnd.nextLong(1L << 40) - (1L << 39)
        else rnd.nextLong(1L << 40) + 1
      val shared = Set.fill(nShared)(freshKey())
      val onlyA = Set.fill(nEach - shared.size)(freshKey()) -- shared
      val onlyB =
        Set.fill(nEach - shared.size)(freshKey()) -- shared -- onlyA
      val aKeys = shared ++ onlyA
      val bKeys = shared ++ onlyB
      val exactTruth = (aKeys intersect bKeys).size.toLong
      // scatter each key into 1-3 random months (duplicates exercise
      // the per-month distinct + semilattice re-truncate)
      val rows = (aKeys.toSeq.map(("A", _)) ++ bKeys.toSeq.map(("B", _)))
        .flatMap { case (s, k) =>
          (0 to rnd.nextInt(3)).map(_ => (s, rnd.nextInt(12), k))
        }
      val labeled = rows.toDF("side", "m", "key")
      val row = graft.queries.AggQueries
        .kmvIntersectOf(labeled, "A", "B").collect().head
      val (nA, nB, exact, est) = (row.getLong(0), row.getLong(1),
        row.getLong(2), row.getDouble(4))
      assert(nA == aKeys.size && nB == bKeys.size && exact == exactTruth,
        s"exact pass wrong (seed=$seed overlap=$overlap): " +
          s"($nA,$nB,$exact) vs (${aKeys.size},${bKeys.size},$exactTruth)")
      // local re-derivation of the same estimator
      val K = 256
      val aBot = aKeys.toSeq.sortBy(k => (h(k), k)).take(K)
      val bBot = bKeys.toSeq.sortBy(k => (h(k), k)).take(K)
      val theta = math.min(
        if (aKeys.size >= K) h(aBot.last) else M,
        if (bKeys.size >= K) h(bBot.last) else M)
      val c = (aBot.toSet intersect bBot.toSet).count(k => h(k) <= theta)
      val localEst = c.toDouble * M / theta
      assert(math.abs(est - localEst) < 1e-6,
        s"distributed estimate diverged from the local one " +
          s"(seed=$seed overlap=$overlap): $est vs $localEst (c=$c)")
      // statistical sanity per-universe: 5σ of the binomial the
      // estimator samples (σ_rel ≈ 1/√c), floored for tiny c
      val bound = math.max(24.0, 5.0 * exact / math.sqrt(math.max(c, 1)))
      assert(math.abs(est - exact) <= bound,
        s"estimate outside 5σ (seed=$seed overlap=$overlap): " +
          s"est=$est exact=$exact c=$c")
      relErrs ::= math.abs(est - exact) / math.max(exact, 1L).toDouble
    }
    // and in aggregate the estimator is actually GOOD, not just bounded
    assert(relErrs.sum / relErrs.size <= 0.15,
      s"mean relative error too high: $relErrs")
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

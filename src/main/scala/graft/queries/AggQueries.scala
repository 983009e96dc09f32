package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grouped / global / distinct / hierarchical aggregation surface
  * (SURVEY.md §2b "Aggregations"). All shapes plan to partial+final
  * HashAggregate with map-side combine — at 100 TB the shuffle carries
  * only one row per (partition, group), never raw rows.
  */
object AggQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Flagship: TPC-H Q1-style pricing summary. Scan → filter → hash-agg
    * (8 aggregates) → sort. Catalyst pushes the shipdate filter into the
    * parquet scan and prunes to the 7 referenced columns. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax")), 6).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Global (no grouping) aggregate over orders. */
  def globalAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).agg(
      count(lit(1)).as("n_orders"),
      dsum(col("o_totalprice")).as("sum_price"),
      min(col("o_orderdate")).as("min_date"),
      max(col("o_orderdate")).as("max_date"))

  /** Distinct aggregates (count distinct + sum distinct). */
  def distinctAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        dsum(col("l_quantity")).as("sum_qty"),
        sum_distinct(col("l_quantity")
          .cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_dist_qty"))
      .orderBy(col("l_returnflag"))

  /** Rollup over (returnflag, linestatus): subtotals + grand total.
    * GROUPING() disambiguates NULL-as-subtotal from data NULLs. */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"),
        grouping(col("l_returnflag")).cast("int").as("lvl_rf"),
        grouping(col("l_linestatus")).cast("int").as("lvl_ls"))
      .orderBy(col("lvl_rf"), col("lvl_ls"),
        col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Cube over (orderstatus, orderpriority). */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(dsum(col("o_totalprice")).as("sum_price"), count(lit(1)).as("n"),
        grouping(col("o_orderstatus")).cast("int").as("lvl_st"),
        grouping(col("o_orderpriority")).cast("int").as("lvl_pr"))
      .orderBy(col("lvl_st"), col("lvl_pr"),
        col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  /** Approximate distinct (HyperLogLog++), HARD-GATED: DuckDB's HLL is
    * a different sketch, so the raw estimate can never hash-match an
    * oracle — instead the compared output carries the EXACT distinct
    * count plus a `within_rsd` column folding the estimate into the
    * gated plan: the oracle states 1, so an estimate outside the
    * 3×rsd band (rsd 0.02 → 6%) flips the bit and fails the hash gate
    * (VERDICT r12 #4 — retires the last two no_oracle rows). The
    * estimate still computes distributively; only its band membership
    * is compared. */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame = {
    // dedup FIRST (map-side partial + one shuffle on the pair), then
    // count and sketch the distinct pairs in one pass: HLL is
    // set-based, so sketching the deduped keys produces the identical
    // estimate, while countDistinct NEXT TO another aggregate would
    // force an Expand that doubles the scanned rows
    val pairs = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_orderkey"))
      .groupBy(col("l_returnflag"), col("l_orderkey")).agg(lit(1))
    pairs
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("exact_orders"),
        approx_count_distinct(col("l_orderkey"), 0.02).as("est"))
      .select(col("l_returnflag"), col("exact_orders"),
        (abs(col("est") - col("exact_orders"))
          <= col("exact_orders").cast("double") * lit(0.06))
          .cast("int").as("within_rsd"))
      .orderBy(col("l_returnflag"))
  }

  /** Mergeable-sketch rollup (Datasketches HLL): build one HLL sketch
    * of the customer set per (priority, month), then UNION the monthly
    * sketches per priority and read the estimate off the merged sketch.
    * The two-level shape is the point — at 100 TB you pre-aggregate
    * sketches at ingest grain (partition/day) and any coarser distinct
    * count is a cheap register-max merge of kilobyte sketches, never a
    * re-scan. Merge is exact w.r.t. the sketch (register-wise max is
    * associative/commutative: SketchSpec asserts union-of-monthly ==
    * one-global-sketch bit-for-bit), so pre-aggregation loses nothing.
    * Estimate is approximate, but the row is HARD-GATED like
    * [[approxDistinct]]: the compared output is the exact per-priority
    * distinct (one extra aggregation the oracle restates) plus a
    * `within_rsd` band check on the merged-sketch estimate (default
    * Datasketches lgK=12 → rsd ≈ 1.6%, banded at 5% ≈ 3σ, the
    * SketchSpec bound). */
  def hllRollup(spark: SparkSession, dir: String): DataFrame = {
    val monthly = Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"),
        date_trunc("month", col("o_orderdate")).as("m"))
      .agg(expr("hll_sketch_agg(o_custkey)").as("sk"))
    val merged = monthly.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_months"),
        expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
    val exact = Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("exact_cust"))
    merged.join(exact, "o_orderpriority")
      .select(col("o_orderpriority"), col("n_months"), col("exact_cust"),
        (abs(col("est") - col("exact_cust"))
          <= col("exact_cust").cast("double") * lit(0.05))
          .cast("int").as("within_rsd"))
      .orderBy(col("o_orderpriority"))
  }

  /** Mergeable QUANTILE sketch rollup — the quantile sibling of
    * [[hllRollup]], FULLY hash-gated because the sketch itself is
    * deterministic: a bottom-k sample by the Knuth multiplicative
    * hash of the (unique) order key. bottom-k is a semilattice
    * (union-then-truncate is associative, commutative, idempotent),
    * so the two-level shape loses nothing: per-(priority, month)
    * partials at ingest grain re-truncate to the EXACT same k-sample
    * one global pass would pick — SketchSpec pins that equality — and
    * any coarser quantile is a kilobyte merge, never a re-scan. The
    * median estimate is the sample's lower median (a value plucked
    * from the data, no arithmetic), and its exact rank in the full
    * group is re-derived by one counting pass — every output column
    * is integer/plucked-double, so DuckDB restates the whole pipeline
    * literally (no band bit needed; the spec separately pins the
    * ±3σ rank band the sample size implies). */
  def quantileSketchRollup(spark: SparkSession, dir: String): DataFrame = {
    val K = 256
    // overflow-safe Knuth hash: keys are folded mod 2³¹ BEFORE the
    // multiply (2³¹ · 2654435761 < Long.MAX), so petabyte-scale key
    // domains (BenchFocus shifts keys past 10¹⁰) never trip ANSI
    // overflow; the bare key·A form elsewhere documents a bounded
    // key domain
    val o = Tables.orders(spark, dir)
      .select(col("o_orderpriority"),
        date_trunc("month", col("o_orderdate")).as("m"),
        col("o_orderkey"), col("o_totalprice"))
      .withColumn("h",
        col("o_orderkey") % lit(2147483648L) * lit(2654435761L)
          % lit(4294967296L))
    // level 1: ingest-grain partials — bottom-K by hash per month,
    // through the bounded-heap whole-operator rather than a
    // row_number() window: a window has no partial aggregation, so
    // each (priority, month)'s FULL key set would shuffle into and
    // sort inside ONE task — linear single-core work at 100 TB.
    // TopKPerGroupExec cuts every map partition to ≤ K candidates per
    // group BEFORE the exchange, so the shuffle carries kilobytes and
    // the final pass is a streaming scan. bottom-k is a semilattice,
    // so the kept set is bit-identical to the window formulation
    // (SketchSpec pins the equality; the (h, key) order is total).
    val partial = graft.operators.TopKPerGroup(o,
        Seq(col("o_orderpriority"), col("m")),
        struct(col("h"), col("o_orderkey")), descending = false, k = K)
      .drop("rn")
    // level 2: merge = union + re-truncate to bottom-K per priority
    val w2 = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("h"), col("o_orderkey"))
    val merged = partial.withColumn("rk2", row_number().over(w2))
      .filter(col("rk2") <= K)
    // estimate: the sample's lower median by value
    val w3 = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val est = merged
      .withColumn("vr", row_number().over(w3))
      .withColumn("sample_n", count(lit(1))
        .over(Window.partitionBy(col("o_orderpriority"))))
      .filter(col("vr") === expr("(sample_n + 1) div 2"))
      .select(col("o_orderpriority"),
        col("o_totalprice").as("est_median"), col("sample_n"))
    // exact rank of the estimate: one counting pass over the group
    Tables.orders(spark, dir)
      .join(broadcast(est), "o_orderpriority")
      .groupBy(col("o_orderpriority"), col("est_median"), col("sample_n"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("o_totalprice") <= col("est_median"), 1L)
          .otherwise(0L)).as("rank_le"))
      .select(col("o_orderpriority"), col("n"), col("sample_n"),
        col("est_median"), col("rank_le"))
      .orderBy(col("o_orderpriority"))
  }

  /** KMV (bottom-k) sketch INTERSECTION — the SET-OPERATION member of
    * the sketch family ([[hllRollup]] = union/distinct,
    * [[quantileSketchRollup]] = quantiles, [[bitmapDistinct]] = dense
    * exact): estimate how many distinct customers two order segments
    * SHARE from two kilobyte bottom-k samples, never co-shuffling the
    * full key sets. θ = min over sides of the k-th smallest hash (or
    * the hash-domain max M when a side's whole key set fits in the
    * sample); each sample restricted to h ≤ θ is a uniform θ/M-rate
    * sample of its side, so `|common hashes ≤ θ| · M / θ` estimates
    * the intersection (the K-Minimum-Values estimator). Everything is
    * deterministic — the overflow-safe Knuth hash, the semilattice
    * bottom-k (per-month partials union-retruncate to exactly the
    * global sample, as SketchSpec pins for the quantile twin) — so
    * the gate is the r13 convention: compared columns are the EXACT
    * per-side and intersection distincts (one distributed counting
    * pass the oracle restates) plus a within-band bit on the
    * estimate (k=256 → rsd ≈ √(U/I)/16; the fixture's high overlap
    * keeps 25% ≈ 3σ, floored at ±16 for tiny intersections). The
    * 100 TB shape: per-segment bottom-k partials at ingest grain are
    * kilobytes; ANY later set-operation question (overlap of two
    * cohorts, audience intersection) is a sample merge, not a
    * re-scan of either segment. */
  def sketchIntersection(spark: SparkSession, dir: String): DataFrame =
    kmvIntersectOf(
      Tables.orders(spark, dir)
        .filter(col("o_orderstatus").isin("O", "F"))
        .select(col("o_orderstatus").as("side"),
          date_trunc("month", col("o_orderdate")).as("m"),
          col("o_custkey").as("key")),
      sideA = "O", sideB = "F")
      // the raw estimate stays spec-only — only its band membership is
      // engine-comparable
      .select(col("n_a"), col("n_b"), col("exact_inter"),
        col("within_band"))

  /** The two-level bottom-k sample pipeline for any `(side, m, key)`
    * frame — split out so PlanShapeSpec can pin the LEVEL-1 shape
    * (bounded-heap TopKPerGroupExec, no Window over (side, m)).
    *
    * Level 1: per-(side, month) DISTINCT keys, bottom-K by hash — the
    * ingest-grain partial. The distinct is a partial+final
    * HashAggregate (map-side combine), and the bottom-K cut runs
    * through the bounded-heap whole-operator instead of a
    * row_number() window: the window would funnel each (side, month)'s
    * entire distinct-key set through one task's sort, while
    * TopKPerGroupExec bounds every map partition to ≤ K candidates per
    * group before the exchange — the same kilobyte partial at any
    * corpus size. (h, key) is a total order on the distinct rows, so
    * the kept sample is bit-identical to the window formulation.
    *
    * Level 2: merge per side = union, re-distinct, re-truncate. The
    * window here is fine: ≤ K·months rows enter each side's partition
    * — bounded metadata, not O(N). */
  private[graft] def kmvSample(labeled: DataFrame, K: Int): DataFrame = {
    // pmod, not %: Scala/Spark % preserves sign, so a negative key
    // would hash NEGATIVE — the "bottom-k" would then sample the
    // most-negative keys instead of uniformly, and θ itself could go
    // negative while the band bit still printed a clean 0/1. The
    // helper is documented for ANY key frame, so the fold must be
    // total, not a positive-domain convention.
    val hashed = labeled.withColumn("h",
      pmod(col("key"), lit(2147483648L)) * lit(2654435761L)
        % lit(4294967296L))
    val d1 = hashed.groupBy(col("side"), col("m"), col("h"),
      col("key")).agg(lit(1))
    val partial = graft.operators.TopKPerGroup(d1,
        Seq(col("side"), col("m")),
        struct(col("h"), col("key")), descending = false, k = K)
      .drop("rn")
    val d2 = partial.groupBy(col("side"), col("h"), col("key"))
      .agg(lit(1))
    val w2 = Window.partitionBy(col("side"))
      .orderBy(col("h"), col("key"))
    d2.withColumn("rk2", row_number().over(w2))
      .filter(col("rk2") <= K)
  }

  /** The KMV pipeline over any `(side, m, key)` frame — `private[graft]`
    * so SketchSpec can drive it over seeded RANDOM universes with
    * controlled overlap, beyond the orders fixture. */
  private[graft] def kmvIntersectOf(labeled: DataFrame,
      sideA: String, sideB: String, K: Int = 256): DataFrame = {
    val M = 4294967296L // Knuth-fold hash domain [0, 2^32)
    val sample = kmvSample(labeled, K)
    // The merged sample is ≤ 2K rows BY CONSTRUCTION — kilobyte
    // metadata regardless of corpus size, the same class as the
    // driver-collected IVF centroids — so the estimator folds on the
    // driver: keeping it in the plan would re-execute the whole
    // two-level sample pipeline THREE times (the θ aggregate plus
    // each side of the common-key join all reference `sample`, and
    // results are never persisted by bench convention), which the
    // round-14 plan audit surfaced as 16 exchanges for a 1-row query.
    val rows = sample
      .select(col("side"), col("h"), col("key")).collect()
    val aBot = rows.filter(_.getString(0) == sideA)
    val bBot = rows.filter(_.getString(0) == sideB)
    // θ per side: k-th smallest hash when the sample is FULL, else M
    // (a short sample IS its side's whole key set)
    def thetaOf(side: Array[org.apache.spark.sql.Row]): Long =
      if (side.length == K) side.map(_.getLong(1)).max else M
    val theta = math.min(thetaOf(aBot), thetaOf(bBot))
    val bKeys = bBot.map(_.getLong(2)).toSet
    val c = aBot.count(r => bKeys(r.getLong(2)) && r.getLong(1) <= theta)
    val est = c.toDouble * M.toDouble / theta.toDouble
    // exact intersection: ONE counting pass, per-key presence flags
    labeled
      .groupBy(col("key"))
      .agg(max(when(col("side") === sideA, 1L).otherwise(0L))
        .as("ia"),
        max(when(col("side") === sideB, 1L).otherwise(0L))
          .as("ib"))
      .agg(sum(col("ia")).as("n_a"), sum(col("ib")).as("n_b"),
        sum(col("ia") * col("ib")).as("exact_inter"))
      .select(col("n_a"), col("n_b"), col("exact_inter"),
        (abs(lit(est) - col("exact_inter").cast("double")) <=
          greatest(lit(16.0),
            col("exact_inter").cast("double") * lit(0.25)))
          .cast("int").as("within_band"),
        lit(est).as("est"))
  }

  /** EXACT mergeable distinct for dense key domains — the
    * bitmap-index counterpart of [[hllRollup]]: per-(priority, month,
    * bucket) bitmaps built at ingest grain
    * (`bitmap_construct_agg(bitmap_bit_position(key))`), per-priority
    * register-OR merge (`bitmap_or_agg` — associative/commutative
    * like the HLL register max), and the distinct count is the SUM of
    * per-bucket popcounts, EXACT rather than estimated. The 100 TB
    * shape: pre-aggregate 4 KB bucket bitmaps at partition/day grain
    * and any coarser distinct count is a bitmap OR, never a re-scan —
    * the right tool when keys are dense integers (surrogate keys),
    * with HLL as the sparse/unbounded-domain fallback. Exact → plain
    * COUNT DISTINCT oracle; the bucket machinery stays Spark-side. */
  def bitmapDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .selectExpr("o_orderpriority",
        "date_trunc('month', o_orderdate) AS m",
        "bitmap_bucket_number(o_custkey) AS bkt",
        "bitmap_bit_position(o_custkey) AS pos")
      .groupBy(col("o_orderpriority"), col("m"), col("bkt"))
      .agg(expr("bitmap_construct_agg(pos)").as("bm"))
      .groupBy(col("o_orderpriority"), col("bkt"))
      .agg(expr("bitmap_count(bitmap_or_agg(bm))").as("c"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("c")).as("exact_cust"))
      .orderBy(col("o_orderpriority"))

  /** Vector re-assembly: per-order sorted list of line numbers as CSV
    * string (string form is hash-stable across engines; Spark
    * collect_list order is nondeterministic so we sort before joining). */
  def collectAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") <= 100)
      .groupBy(col("l_orderkey"))
      .agg(
        array_join(
          transform(sort_array(collect_list(col("l_linenumber"))),
            _.cast("string")), ",").as("line_numbers"),
        size(collect_set(col("l_returnflag"))).as("n_flags"))
      .orderBy(col("l_orderkey"))

  /** Exact percentiles, sort-based: rank each value in its group, keep
    * only the two rows that bracket position p·(n−1), and interpolate
    * `lo·(1−frac) + hi·frac` — the same math as Spark's built-in
    * `percentile` and DuckDB's `quantile_cont`, rounded to 6 decimals to
    * absorb interpolation-arithmetic ulps.
    *
    * Why not the built-in `percentile`: it is a TypedImperativeAggregate
    * that buffers every (value → count) in memory and merges whole
    * buffers on one reducer per group — at 100 TB the buffer IS the
    * data and the reducer melts. The rank formulation is a distributed
    * sort (shuffle + per-partition spill-able sort) plus a 2-rows-per-
    * group aggregate, the shape that survives scale; it is also ~3×
    * faster here. (Parallelism within one group is bounded by the sort's
    * range partitioning, not by group count; `percentile_approx` remains
    * the single-pass alternative, bounded vs these exact values in
    * ScalaTest.) */
  def percentileAgg(spark: SparkSession, dir: String): DataFrame = {
    // No fanOut here: the rank windows shuffle on l_returnflag anyway,
    // so a pre-repartition is a pure extra exchange.
    val li = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity"))

    // Exact interpolated percentiles of `c` per group, one sorted window
    // over the column shared by all requested percentiles.
    def pcts(c: String, ps: Seq[(Double, String)]): DataFrame = {
      val w = Window.partitionBy(col("l_returnflag")).orderBy(col(c))
      // group sizes via a tiny pre-aggregate broadcast back onto the
      // rows, NOT count().over(partitionBy): the unordered whole-group
      // window frame buffers (and past 4096 rows, spills) every group
      // just to stamp one number, while row_number's running frame
      // streams. At 100 TB the count side is still one row per group.
      // null-safe join key: the window formulation (and the oracle's
      // GROUP BY) keeps a NULL group; a null-unsafe equi join would
      // silently drop it
      val sizes = li.groupBy(col("l_returnflag").as("szflag"))
        .agg(count(lit(1)).as("n"))
      val ranked = li.select(col("l_returnflag"), col(c))
        .withColumn("rn", row_number().over(w).cast("long") - 1L)
        .join(broadcast(sizes), col("l_returnflag") <=> col("szflag"))
        .drop("szflag")
      val aggs = ps.map { case (p, name) =>
        val pos = lit(p) * (col("n") - 1L).cast("double")
        val lo = floor(pos)
        val hi = ceil(pos)
        val frac = pos - lo.cast("double")
        round(sum(
          when(col("rn") === lo && col("rn") === hi, col(c))
            .when(col("rn") === lo, col(c) * (lit(1.0) - frac))
            .when(col("rn") === hi, col(c) * frac)), 6).as(name)
      }
      ranked.groupBy(col("l_returnflag")).agg(aggs.head, aggs.tail: _*)
    }

    // Low-cardinality column (l_quantity: ~50 distinct values): exact
    // percentile from the value histogram instead of ranking 600k rows —
    // group to (flag, value) counts (one small shuffle), cumulative-sum
    // the ~50-row-per-group histogram, and read the bracketing values
    // off the cumulative counts. The technique of choice at 100 TB for
    // any bounded-domain measure.
    def pctLowCard(c: String, p: Double, name: String): DataFrame = {
      val counts = li.groupBy(col("l_returnflag"), col(c))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("l_returnflag")).orderBy(col(c))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wg = Window.partitionBy(col("l_returnflag"))
      val annotated = counts
        .withColumn("cum", sum(col("cnt")).over(w))
        .withColumn("n", sum(col("cnt")).over(wg))
        .withColumn("pos", lit(p) * (col("n") - 1L).cast("double"))
        .withColumn("lo", floor(col("pos")))
        .withColumn("hi", ceil(col("pos")))
        .withColumn("frac", col("pos") - col("lo").cast("double"))
      annotated.groupBy(col("l_returnflag")).agg(
        round(
          min(when(col("cum") >= col("lo") + 1L, col(c))) *
            (lit(1.0) - max(col("frac"))) +
            min(when(col("cum") >= col("hi") + 1L, col(c))) *
              max(col("frac")), 6).as(name))
    }

    val price = pcts("l_extendedprice",
      Seq(0.5 -> "median_price", 0.9 -> "p90_price"))
    val qty = pctLowCard("l_quantity", 0.25, "q1_qty")
    price.join(qty, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("median_price"), col("p90_price"),
        col("q1_qty"))
      .orderBy(col("l_returnflag"))
  }

  /** Statistical aggregates. Both engines use numerically stable
    * (Welford-style) accumulation; merge order still perturbs the last
    * few ulps, so outputs are rounded with margins sized to each
    * statistic's magnitude (stddev ~1e4 → 2dp; corr ∈ [-1,1] → 6dp). */
  def statsAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(stddev_samp(col("l_extendedprice")), 2).as("sd_price"),
        round(stddev_pop(col("l_quantity")), 4).as("sdp_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6)
          .as("corr_qty_price"),
        round(covar_samp(col("l_quantity"), col("l_discount")), 6)
          .as("cov_qty_disc"))
      .orderBy(col("l_returnflag"))

  /** Equi-width histogram by plain integer arithmetic (floor of the
    * value over the bin width) — engine-portable unlike width_bucket
    * variants, and a single hash aggregation at any scale. */
  def histogramAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(floor(col("o_totalprice") / 50000.0).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("bucket"))

  /** Deterministic mode (most frequent o_orderpriority per status,
    * ties to the smallest value) plus its support count and share.
    * The built-in `mode()`/`max_by` break ties arbitrarily — useless
    * for a hash-checked contract — so the mode is declared as
    * count-then-rank: one hash aggregation on (group, value), a window
    * over the tiny (group, value) aggregate (25 rows here; bounded by
    * the value domain, not the data, at any scale), keep rank 1. */
  def modeAgg(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    val totals = Window.partitionBy(col("o_orderstatus"))
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("n").desc, col("o_orderpriority").asc)
    counts
      .withColumn("n_group", sum(col("n")).over(totals))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_orderstatus"),
        col("o_orderpriority").as("mode_priority"),
        col("n").as("n_mode"),
        round(col("n") / col("n_group"), 6).as("mode_share"))
      .orderBy(col("o_orderstatus"))
  }

  /** EXACT frequent items (tokens occurring in > 3% of the corpus) via
    * the two-pass sketch-then-confirm shape — the way heavy hitters are
    * found at 100 TB without shuffling the full token domain:
    *  - pass 1: Misra–Gries candidate sketch (`stat.freqItems`) — a
    *    bounded ~1/support-counter summary per partition merged on the
    *    driver, guaranteed a SUPERSET of every item with frequency >
    *    support·n regardless of traversal order;
    *  - pass 2: exact counts restricted to the candidates (broadcast
    *    IN-list pushed to the scan) — the confirm shuffle carries
    *    O(candidates × partitions) rows, never the domain. False
    *    positives die on the integer threshold; false negatives cannot
    *    exist. The final answer is therefore exact and hash-gated. */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val toks = fanOut(Tables.documents(spark, dir))
      .select(explode(split(col("text"), " ")).as("token"))
    val cands = toks.stat.freqItems(Seq("token"), 0.03)
      .head().getSeq[String](0)
    // total tokens WITHOUT another explode pass: size(split) per doc,
    // a narrow aggregate — at corpus scale this is the difference
    // between two and three full explode passes per run
    val n = Tables.documents(spark, dir)
      .agg(sum(size(split(col("text"), " ")))).head().getLong(0)
    toks.filter(col("token").isin(cands: _*))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit(100L) > lit(n) * lit(3L))
      .orderBy(col("cnt").desc, col("token"))
  }

  val defs: Map[String, Q] = Map(
    "agg_heavy_hitters" -> (heavyHitters _),
    "agg_mode" -> (modeAgg _),
    "agg_stats" -> (statsAgg _),
    "agg_histogram" -> (histogramAgg _),
    "agg_percentile" -> (percentileAgg _),
    "q1_pricing_summary" -> (q1PricingSummary _),
    "agg_global" -> (globalAgg _),
    "agg_distinct" -> (distinctAgg _),
    "agg_rollup" -> (rollupAgg _),
    "agg_cube" -> (cubeAgg _),
    "agg_approx_distinct" -> (approxDistinct _),
    "agg_sketch_intersection" -> (sketchIntersection _),
    "agg_hll_rollup" -> (hllRollup _),
    "agg_quantile_sketch" -> (quantileSketchRollup _),
    "agg_bitmap_distinct" -> (bitmapDistinct _),
    "agg_collect" -> (collectAgg _))

  private val q1Sql =
    """SELECT l_returnflag, l_linestatus,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      | CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      | CAST(SUM(CAST(l_extendedprice*(1.0-l_discount)*(1.0+l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) AS avg_qty,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) AS avg_price,
      | CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE)/COUNT(*) AS avg_disc,
      | COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  val sql: Map[String, String] = Map(
    "agg_sketch_intersection" ->
      """WITH f AS (SELECT o_custkey,
        |  MAX(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS ia,
        |  MAX(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS ib
        | FROM orders WHERE o_orderstatus IN ('O', 'F')
        | GROUP BY o_custkey)
        |SELECT CAST(SUM(ia) AS BIGINT) AS n_a,
        | CAST(SUM(ib) AS BIGINT) AS n_b,
        | CAST(SUM(ia * ib) AS BIGINT) AS exact_inter,
        | 1 AS within_band
        |FROM f""".stripMargin,
    "agg_bitmap_distinct" ->
      """SELECT o_orderpriority,
        | COUNT(DISTINCT o_custkey) AS exact_cust
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "agg_approx_distinct" ->
      """SELECT l_returnflag,
        | COUNT(DISTINCT l_orderkey) AS exact_orders,
        | 1 AS within_rsd
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "agg_hll_rollup" ->
      """SELECT o_orderpriority,
        | COUNT(DISTINCT date_trunc('month', o_orderdate)) AS n_months,
        | COUNT(DISTINCT o_custkey) AS exact_cust,
        | 1 AS within_rsd
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "agg_quantile_sketch" ->
      """WITH o AS (SELECT o_orderpriority,
        |  date_trunc('month', o_orderdate) AS m, o_orderkey,
        |  o_totalprice,
        |  (o_orderkey % 2147483648 * 2654435761) % 4294967296 AS h
        |  FROM orders),
        |p1 AS (SELECT *, ROW_NUMBER() OVER (
        |  PARTITION BY o_orderpriority, m
        |  ORDER BY h, o_orderkey) AS rk FROM o),
        |partial AS (SELECT * FROM p1 WHERE rk <= 256),
        |m1 AS (SELECT *, ROW_NUMBER() OVER (
        |  PARTITION BY o_orderpriority
        |  ORDER BY h, o_orderkey) AS rk2 FROM partial),
        |merged AS (SELECT * FROM m1 WHERE rk2 <= 256),
        |s AS (SELECT o_orderpriority, o_totalprice,
        |  ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice, o_orderkey) AS vr,
        |  COUNT(*) OVER (PARTITION BY o_orderpriority) AS sample_n
        | FROM merged),
        |est AS (SELECT o_orderpriority, o_totalprice AS est_median,
        |  sample_n FROM s WHERE vr = (sample_n + 1) // 2)
        |SELECT o.o_orderpriority, COUNT(*) AS n, e.sample_n,
        | e.est_median,
        | CAST(SUM(CASE WHEN o.o_totalprice <= e.est_median
        |   THEN 1 ELSE 0 END) AS BIGINT) AS rank_le
        |FROM orders o JOIN est e
        |  ON o.o_orderpriority = e.o_orderpriority
        |GROUP BY o.o_orderpriority, e.sample_n, e.est_median
        |ORDER BY o.o_orderpriority""".stripMargin,
    "agg_heavy_hitters" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |SELECT token, COUNT(*) AS cnt FROM t
        |GROUP BY token
        |HAVING COUNT(*) * 100 > (SELECT COUNT(*) FROM t) * 3
        |ORDER BY cnt DESC, token""".stripMargin,
    "agg_histogram" ->
      """SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY bucket ORDER BY bucket""".stripMargin,
    "agg_mode" ->
      """WITH counts AS (
        |  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |  FROM orders GROUP BY 1, 2),
        |ranked AS (
        |  SELECT o_orderstatus, o_orderpriority, n,
        |   SUM(n) OVER (PARTITION BY o_orderstatus) AS n_group,
        |   ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |     ORDER BY n DESC, o_orderpriority ASC) AS rn
        |  FROM counts)
        |SELECT o_orderstatus, o_orderpriority AS mode_priority,
        | n AS n_mode, round(n / n_group, 6) AS mode_share
        |FROM ranked WHERE rn = 1 ORDER BY o_orderstatus""".stripMargin,
    "agg_stats" ->
      """SELECT l_returnflag,
        | round(stddev_samp(l_extendedprice), 2) AS sd_price,
        | round(stddev_pop(l_quantity), 4) AS sdp_qty,
        | round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        | round(covar_samp(l_quantity, l_discount), 6) AS cov_qty_disc
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_percentile" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_extendedprice, 0.5), 6) AS median_price,
        | round(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price,
        | round(quantile_cont(l_quantity, 0.25), 6) AS q1_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q1_pricing_summary" -> q1Sql,
    "agg_global" ->
      """SELECT COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        | MIN(o_orderdate) AS min_date, MAX(o_orderdate) AS max_date
        |FROM orders""".stripMargin,
    "agg_distinct" ->
      """SELECT l_returnflag,
        | COUNT(DISTINCT l_suppkey) AS n_supp,
        | COUNT(DISTINCT l_partkey) AS n_part,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_dist_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | COUNT(*) AS n,
        | CAST(GROUPING(l_returnflag) AS INT) AS lvl_rf,
        | CAST(GROUPING(l_linestatus) AS INT) AS lvl_ls
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY lvl_rf, lvl_ls, l_returnflag ASC NULLS FIRST,
        | l_linestatus ASC NULLS FIRST""".stripMargin,
    "agg_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        | COUNT(*) AS n,
        | CAST(GROUPING(o_orderstatus) AS INT) AS lvl_st,
        | CAST(GROUPING(o_orderpriority) AS INT) AS lvl_pr
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY lvl_st, lvl_pr, o_orderstatus ASC NULLS FIRST,
        | o_orderpriority ASC NULLS FIRST""".stripMargin,
    "agg_collect" ->
      """SELECT l_orderkey,
        | STRING_AGG(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber) AS line_numbers,
        | CAST(COUNT(DISTINCT l_returnflag) AS INT) AS n_flags
        |FROM lineitem WHERE l_orderkey <= 100
        |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin)
}

package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join surface (SURVEY.md §2b "Joins"): equi inner/outer/semi/anti,
  * broadcast, theta, cross, interval, as-of.
  *
  * Scale notes (100 TB): the big fact-fact equi joins shuffle both sides
  * on the key and let AQE pick SMJ vs shuffled-hash; dimension joins are
  * explicitly `broadcast()` so the fact side never shuffles. The interval
  * and as-of shapes keep the build side small (filtered/broadcastable) or
  * key-partitioned so the range/window work happens within a partition.
  */
object JoinQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Fact-fact equi inner join: revenue by order priority.
    * lineitem⋈orders both shuffle on orderkey; agg is partial+final. */
  def innerJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"), "inner")
      .groupBy(col("o_orderpriority"))
      .agg(
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("o_orderpriority"))
  }

  /** Snowflake dimension join, dims explicitly broadcast: customers per
    * region. No shuffle of customer — both dims ship to every task. */
  def broadcastJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_bal"))
      .orderBy(col("r_name"))
  }

  /** Left outer with an extra non-equi conjunct: orders and their
    * high-quantity lines; unmatched orders survive with zeros. */
  def leftOuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    o.join(li, o("o_orderkey") === li("l_orderkey") && li("l_quantity") >= 45,
        "left_outer")
      .groupBy(col("o_orderkey"))
      .agg(
        count(col("l_orderkey")).as("n_big"),
        coalesce(dsum(col("l_quantity")), lit(0.0)).as("qty"))
      .orderBy(col("o_orderkey"))
  }

  /** Right outer: every part, with its heavy lines counted from the left
    * side. */
  def rightOuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir)
    li.join(p, li("l_partkey") === p("p_partkey") && li("l_quantity") >= 48,
        "right_outer")
      .groupBy(col("p_partkey"))
      .agg(count(col("l_partkey")).as("n_heavy"))
      .orderBy(col("p_partkey"))
  }

  /** Full outer of two pre-aggregated sides keyed by nation: customer
    * counts vs supplier counts (aggregate-then-join keeps the shuffled
    * data one row per key — at scale, never full-outer raw fact tables
    * when a pre-agg expresses the question). */
  def fullOuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val ca = Tables.customer(spark, dir)
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_cust"))
    val sa = Tables.supplier(spark, dir)
      .groupBy(col("s_nationkey")).agg(count(lit(1)).as("n_supp"))
    ca.join(sa, ca("c_nationkey") === sa("s_nationkey"), "full_outer")
      .select(
        coalesce(ca("c_nationkey"), sa("s_nationkey")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy(col("nationkey"))
  }

  /** Left semi (EXISTS): customers that placed at least one urgent order. */
  def semiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** Left anti (NOT EXISTS): customers with no urgent orders. */
  def antiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** Theta: equi prefix (same nation) + inequality residual — for each
    * supplier, how many same-nation suppliers hold a larger balance.
    * Equi part keeps it a hash join; the residual filters post-probe. */
  def thetaJoin(spark: SparkSession, dir: String): DataFrame = {
    val s1 = Tables.supplier(spark, dir).as("s1")
    val s2 = Tables.supplier(spark, dir).as("s2")
    s1.join(s2,
        col("s1.s_nationkey") === col("s2.s_nationkey") &&
          col("s1.s_acctbal") < col("s2.s_acctbal"), "left_outer")
      .groupBy(col("s1.s_suppkey").as("s_suppkey"))
      .agg(count(col("s2.s_suppkey")).as("n_richer"))
      .orderBy(col("s_suppkey"))
  }

  /** Cross join: full region × nation grid. */
  def crossJoinQ(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(spark, dir)
    val n = Tables.nation(spark, dir)
    r.crossJoin(n)
      .select(col("r_name"), col("n_name"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Interval join: events within [signup, signup+1h) for the same user.
    * Equi on user_id keeps the shuffle keyed; the time range is a
    * residual predicate evaluated inside each hash bucket. */
  def intervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val s = Tables.events(spark, dir)
      .filter(col("event_type") === "signup").as("s")
    val e = Tables.events(spark, dir).as("e")
    s.join(e,
        col("e.user_id") === col("s.user_id") &&
          col("e.ts") >= col("s.ts") &&
          col("e.ts") < col("s.ts") + expr("INTERVAL 1 HOUR"), "left_outer")
      .groupBy(col("s.event_id").as("signup_id"))
      .agg(count(col("e.event_id")).as("n_events_1h"))
      .orderBy(col("signup_id"))
  }

  /** As-of join: for each purchase, the latest click by the same user
    * at or before the purchase. Union-and-carry formulation — tag both
    * streams, sort once per user (clicks before purchases on ts ties so
    * `click.ts <= purchase.ts` is inclusive), and carry the running max
    * click-ts forward. Linear in events per user, versus the quadratic
    * join-then-rank shape (every purchase × every earlier click) that
    * melts at 100 TB. The oracle states the same thing as MAX(ts)
    * under a LEFT JOIN. */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"),
        when(col("event_type") === "click", 0).otherwise(1).as("tag"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("tag").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("last_click_ts",
        max(when(col("tag") === 0, col("ts"))).over(w))
      .filter(col("tag") === 1)
      .select(col("event_id").as("purchase_id"),
        col("last_click_ts").as("asof_click_ts"))
      .orderBy(col("purchase_id"))
  }

  /** NEAREST-direction as-of join (pandas merge_asof
    * direction='nearest'): each purchase picks the user's temporally
    * CLOSEST click, looking both backward and forward — still the
    * single-shuffle union-tag plan, never a pairwise join: one
    * backward running-max and one forward running-min over the same
    * per-user frame, then an integer epoch-distance pick (ties prefer
    * the backward click, same-timestamp clicks count as backward at
    * distance 0; WITHIN a direction, equal floor-second distances
    * resolve to the LATEST backward / EARLIEST forward click — what
    * the running max/min compute, and what the oracle's direction-
    * signed epoch tie-break mirrors). At 100 TB this is ONE hash exchange on user_id;
    * the per-user window is bounded by that user's events. */
  def asofNearestJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"),
        when(col("event_type") === "click", 0).otherwise(1).as("tag"))
    val wb = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("tag").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("tag").desc, col("event_id").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("prev_ts", max(when(col("tag") === 0, col("ts"))).over(wb))
      .withColumn("next_ts", min(when(col("tag") === 0, col("ts"))).over(wf))
      .filter(col("tag") === 1)
      .select(col("event_id").as("purchase_id"),
        when(col("next_ts").isNull, col("prev_ts"))
          .when(col("prev_ts").isNull, col("next_ts"))
          .when(unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts"))
            <= unix_timestamp(col("next_ts")) - unix_timestamp(col("ts")),
            col("prev_ts"))
          .otherwise(col("next_ts")).as("nearest_click_ts"))
      .orderBy(col("purchase_id"))
  }

  /** Null-safe equi join (`<=>`): NULL keys match each other instead of
    * vanishing — Spark still plans a HASH join on the null-safe key (no
    * nested-loop fallback), which is what makes `<=>` usable at scale
    * where a `k = k OR (k IS NULL AND k IS NULL)` disjunction would
    * degrade to BNLJ. Keys are made nullable via NULLIF. */
  def nullSafeJoin(spark: SparkSession, dir: String): DataFrame = {
    val a = Tables.lineitem(spark, dir)
      .groupBy(nullif(col("l_returnflag"), lit("N")).as("k"),
        col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
    val b = Tables.lineitem(spark, dir)
      .groupBy(nullif(col("l_returnflag"), lit("N")).as("k2"))
      .agg(dsum(col("l_quantity")).as("qty"))
    a.join(b, col("k") <=> col("k2"))
      .select(col("k"), col("l_linestatus"), col("n"), col("qty"))
      .orderBy(col("k").asc_nulls_first, col("l_linestatus"))
  }

  /** Runtime-filter join: build a Bloom filter over the (filtered) dim
    * keys, broadcast the sketch, and drop fact rows that cannot join
    * BEFORE the shuffle — the row-level pruning Spark's own
    * InjectRuntimeFilter performs for shuffle joins past its size
    * thresholds (exercised natively in BloomJoinSpec; thresholds target
    * 10 GB+ scans, so the declared query states the pattern explicitly).
    * At 100 TB this is the difference between shuffling the whole fact
    * table and shuffling only the ~segment fraction that can match.
    * Semantics stay EXACT: the Bloom filter has no false negatives and
    * the equi join re-checks the key, so false positives only cost
    * shuffle bytes — the oracle is the plain join.
    *
    * NOTE this query is deliberately EAGER at construction: the sizing
    * count and the sketch build are Spark jobs that run before the
    * returned plan executes — exactly the build pass a native runtime
    * filter performs, surfaced explicitly. Callers that only want the
    * plan (PlanAudit) pay two small dim scans; the fully-deferred
    * alternative is the injected BloomFilterAggregate subquery, which
    * BloomJoinSpec exercises natively. */
  def bloomPrefilterJoin(spark: SparkSession, dir: String): DataFrame = {
    val dim = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    // sizing job first (a Bloom filter needs expected-n; runtime filters
    // pay the same build pass), then the sketch build
    val expected = math.max(dim.count(), 64L)
    val bf = dim.stat.bloomFilter("c_custkey", expected, 0.01)
    val might = bloomMightContain(spark, bf, col("o_custkey"))
    Tables.orders(spark, dir)
      .filter(might)
      .join(dim, col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("o_orderpriority"))
  }

  /** Fuzzy (edit-distance) self-join: near-identical part names within
    * a brand, the string-similarity dedup shape. TWO blocking keys cut
    * the candidate space before any string work:
    *  - brand equality (the semantic block): quadratic work scales with
    *    Σ(block²), not corpus² — without it this is a cartesian;
    *  - an Ed-Join length filter (|len(a)−len(b)| ≤ 2 is necessary for
    *    distance ≤ 2) as a cheap residual BEFORE the DP — not as an
    *    extra join key: the fixture names span only 3 width-3 length
    *    buckets, so bucketing the join key prunes almost nothing while
    *    tripling probe rows (measured it slower).
    * The probe side fans out first: the quadratic probe work is the
    * whole query, and a single-row-group fixture scan would run it on
    * one core (measured 11.9 s single-split vs 1.6 s fanned at sf0.1).
    * k1 < k2 keeps each unordered pair once. */
  def fuzzyJoin(spark: SparkSession, dir: String): DataFrame = {
    val a = fanOut(Tables.part(spark, dir))
      .select(col("p_brand"), col("p_partkey").as("k1"),
        col("p_name").as("n1"), length(col("p_name")).as("len1"))
    val b = Tables.part(spark, dir)
      .select(col("p_brand").as("brand2"), col("p_partkey").as("k2"),
        col("p_name").as("n2"), length(col("p_name")).as("len2"))
    a.join(b, col("p_brand") === col("brand2") && col("k1") < col("k2") &&
        abs(col("len1") - col("len2")) <= 2)
      // threshold variant: early-exits the DP once distance must exceed
      // 2 (returns -1), O(threshold·len) per pair instead of O(len²) —
      // the form that matters when blocks are big; equals the full
      // distance whenever it is within threshold, so the oracle's plain
      // levenshtein agrees on every surviving row
      .select(col("p_brand"), col("k1"), col("k2"),
        levenshtein(col("n1"), col("n2"), 2).as("dist"))
      .filter(col("dist") >= 0)
      .orderBy(col("p_brand"), col("k1"), col("k2"))
  }

  /** Time-bucketed range join: every (purchase, click) pair across ALL
    * users within ±30 minutes — there is NO equi key, so the naive
    * declaration is an O(n²) BroadcastNestedLoopJoin. The scale
    * pattern: quantize time into bucket = epoch_ms DIV window, explode
    * ONE side to its three adjacent buckets (any match is at bucket
    * distance ≤ 1), equi-join on the bucket (one hash shuffle, keyed
    * by time — naturally balanced), then apply the exact residual.
    * Each qualifying pair matches in exactly one exploded bucket (the
    * click's own), so no dedup pass is needed. Work drops from |P|·|C|
    * to Σ_b |P_b±1|·|C_b|. */
  def timeBucketJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    // the probe side produces every candidate pair — fan it out so the
    // single-row-group fixture scan doesn't serialize pair production
    // (at cluster scale the scan arrives pre-split; see fanOut)
    val p = fanOut(e.filter(col("event_type") === "purchase"))
      .select(col("event_id").as("purchase_id"),
        col("ts").as("p_ts"),
        expr("unix_millis(ts) DIV 1800000").as("pb"))
      .select(col("purchase_id"), col("p_ts"),
        explode(array(col("pb") - 1, col("pb"), col("pb") + 1))
          .as("bucket"))
    val c = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts").as("c_ts"),
        expr("unix_millis(ts) DIV 1800000").as("bucket"))
    p.join(c, "bucket")
      .filter(col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTE") &&
        col("c_ts") <= col("p_ts") + expr("INTERVAL 30 MINUTE"))
      .select(col("purchase_id"), col("click_id"),
        (unix_millis(col("c_ts")) - unix_millis(col("p_ts")))
          .as("diff_ms"))
      .orderBy(col("purchase_id"), col("click_id"))
  }

  /** Salted fact-dim join, declared under the hash gate — the manual
    * hot-key defense when AQE's runtime skew split can't help (it
    * splits oversized PARTITIONS, not one oversized KEY): the fact
    * side salts on a row-level hash, the small side explodes across
    * all 8 salts, and the join key becomes (key, salt), spreading a
    * hot key over 8 reducers for an 8× dim replication bounded by the
    * SMALL side's size. The salt values are engine-internal, but the
    * RESULT is salt-invariant (every fact row still matches exactly
    * its dim row), so the oracle is the plain join — a hash match
    * proves the rewrite is lossless. SkewJoinSpec additionally pins
    * the per-reducer spread. */
  def joinSkewSalted(spark: SparkSession, dir: String): DataFrame = {
    val salt = 8
    val li = Tables.lineitem(spark, dir)
      .withColumn("salt",
        pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(salt)))
    val dim = Tables.part(spark, dir)
      .withColumn("salt", explode(array((0 until salt).map(lit): _*)))
    li.join(dim,
        li("l_partkey") === dim("p_partkey") &&
          li("salt") === dim("salt"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"),
        dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("p_brand"))
  }

  /** EXACT set-similarity self-join with PREFIX FILTERING (the
    * AllPairs/PPJoin family): document pairs whose word-set Jaccard is
    * ≥ 0.6, found WITHOUT the all-pairs cross join. Tokens order
    * globally rarest-first (doc-frequency, ties by token); two sets
    * with jac ≥ t must share a token within their first
    * |x| − ceil(t·|x|) + 1 tokens of that order, so only prefix-token
    * collisions become candidates — frequent tokens (stopwords) fall
    * outside most prefixes, which is what kills the candidate blowup
    * at corpus scale. Sizes prune further via the theorem's integer
    * form (5·|B| ≥ 3·|A| for t = 3/5). Verification is exact integer
    * arithmetic end to end — the threshold test 8·|A∩B| ≥ 3·(|A|+|B|)
    * never touches a float — and the displayed jaccard rounds at 6dp.
    * The prefix length uses the integer ceil ((3·sz + 4) div 5):
    * double 0.6·sz rounds UP across exact multiples and would shorten
    * prefixes, silently dropping pairs. Unlike [[fuzzyJoin]]'s
    * blocked edit distance and the MinHash/LSH families, this is the
    * EXACT-threshold join: the oracle restates the same plan and
    * SetSimilaritySpec pins it against the brute-force all-pairs.
    *
    * Universe and output shape: the fixture corpus is ~90% shared
    * boilerplate templates, so the TRUE pair set is quadratic in
    * template-cluster size (7M pairs at sf0.1 — inherent to the data,
    * not the algorithm; in production you near-dedup first). The
    * declared query therefore joins a deterministic 10% systematic
    * slice (`doc_id % 10 = 0` — same integer-hashless slice family as
    * the sampling ops) and reports the per-document ROLLUP (partner
    * count, best jaccard, first partner), keeping the compared result
    * O(docs) while the join under test still runs in full. */
  def setSimilarityJoin(spark: SparkSession, dir: String): DataFrame = {
    val tok = fanOut(Tables.documents(spark, dir))
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("token"))
      .filter(col("token") =!= "")
    setSimilarityPairs(tok)
      .groupBy(col("da"))
      .agg(count(lit(1)).as("n_partners"),
        max(col("jaccard")).as("best_jac"),
        min(col("db")).as("first_partner"))
      .orderBy(col("da"))
  }

  /** The prefix-filtered exact-threshold pair pipeline over a
    * `(doc_id, token)` set frame (tokens distinct per doc).
    * `private[graft]` so SetSimilaritySpec can pin the pair set
    * against the brute-force all-pairs join on small corpora. */
  private[graft] def setSimilarityPairs(tok: DataFrame): DataFrame = {
    val freq = tok.groupBy(col("token")).agg(count(lit(1)).as("tf"))
    val wd = Window.partitionBy(col("doc_id"))
    val ranked = tok.join(freq, "token")
      .withColumn("pos", row_number().over(
        wd.orderBy(col("tf"), col("token"))))
      .withColumn("sz", count(lit(1)).over(wd))
    val prefix = ranked.filter(
      col("pos") <= col("sz") - expr("(3 * sz + 4) div 5") + lit(1))
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.token") === col("b.token") &&
          col("a.doc_id") < col("b.doc_id") &&
          lit(5) * col("a.sz") >= lit(3) * col("b.sz") &&
          lit(5) * col("b.sz") >= lit(3) * col("a.sz"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        col("a.sz").as("na"), col("b.sz").as("nb"))
      .distinct()
    val inter = cand
      .join(tok.as("ta"), col("da") === col("ta.doc_id"))
      .join(tok.as("tb"), col("db") === col("tb.doc_id") &&
        col("ta.token") === col("tb.token"))
      .groupBy(col("da"), col("db"), col("na"), col("nb"))
      .agg(count(lit(1)).as("inter"))
    inter
      .filter(lit(8) * col("inter") >= lit(3) * (col("na") + col("nb")))
      .select(col("da"), col("db"),
        round(col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")), 6).as("jaccard"))
  }

  val defs: Map[String, Q] = Map(
    "join_set_similarity" -> (setSimilarityJoin _),
    "join_skew_salted" -> (joinSkewSalted _),
    "join_time_bucket" -> (timeBucketJoin _),
    "join_fuzzy" -> (fuzzyJoin _),
    "join_bloom_prefilter" -> (bloomPrefilterJoin _),
    "join_nullsafe" -> (nullSafeJoin _),
    "join_inner" -> (innerJoin _),
    "join_broadcast" -> (broadcastJoin _),
    "join_left_outer" -> (leftOuterJoin _),
    "join_right_outer" -> (rightOuterJoin _),
    "join_full_outer" -> (fullOuterJoin _),
    "join_semi" -> (semiJoin _),
    "join_anti" -> (antiJoin _),
    "join_theta" -> (thetaJoin _),
    "join_cross" -> (crossJoinQ _),
    "join_interval" -> (intervalJoin _),
    "join_asof" -> (asofJoin _),
    "join_asof_nearest" -> (asofNearestJoin _))

  val sql: Map[String, String] = Map(
    // the salted rewrite is lossless, so the oracle is the PLAIN join
    "join_skew_salted" ->
      """SELECT p_brand, COUNT(*) AS n,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |  AS sum_price
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "join_time_bucket" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id,
        | epoch_ms(c.ts) - epoch_ms(p.ts) AS diff_ms
        |FROM events p JOIN events c
        | ON p.event_type = 'purchase' AND c.event_type = 'click'
        | AND c.ts >= p.ts - INTERVAL 30 MINUTE
        | AND c.ts <= p.ts + INTERVAL 30 MINUTE
        |ORDER BY purchase_id, click_id""".stripMargin,
    "join_set_similarity" ->
      """WITH tok AS (
        |  SELECT DISTINCT doc_id, t.token
        |  FROM documents, UNNEST(string_split(text, ' ')) AS t(token)
        |  WHERE t.token <> '' AND doc_id % 10 = 0),
        |freq AS (SELECT token, COUNT(*) AS tf FROM tok GROUP BY token),
        |ranked AS (
        |  SELECT tok.doc_id, tok.token,
        |    ROW_NUMBER() OVER (PARTITION BY tok.doc_id
        |      ORDER BY f.tf, tok.token) AS pos,
        |    COUNT(*) OVER (PARTITION BY tok.doc_id) AS sz
        |  FROM tok JOIN freq f ON tok.token = f.token),
        |pfx AS (SELECT * FROM ranked
        |  WHERE pos <= sz - ((3*sz + 4) // 5) + 1),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db,
        |    a.sz AS na, b.sz AS nb
        |  FROM pfx a JOIN pfx b ON a.token = b.token
        |   AND a.doc_id < b.doc_id
        |   AND 5*a.sz >= 3*b.sz AND 5*b.sz >= 3*a.sz),
        |ix AS (
        |  SELECT c.da, c.db, c.na, c.nb, COUNT(*) AS inter
        |  FROM cand c
        |  JOIN tok ta ON c.da = ta.doc_id
        |  JOIN tok tb ON c.db = tb.doc_id AND ta.token = tb.token
        |  GROUP BY c.da, c.db, c.na, c.nb),
        |pairs AS (
        | SELECT da, db,
        |  round(CAST(inter AS DOUBLE)/(na + nb - inter), 6) AS jaccard
        | FROM ix WHERE 8*inter >= 3*(na + nb))
        |SELECT da, COUNT(*) AS n_partners, MAX(jaccard) AS best_jac,
        | MIN(db) AS first_partner
        |FROM pairs GROUP BY da ORDER BY da""".stripMargin,
    "join_fuzzy" ->
      """SELECT a.p_brand, a.p_partkey AS k1, b.p_partkey AS k2,
        | CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
        |FROM part a JOIN part b
        | ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        |WHERE levenshtein(a.p_name, b.p_name) <= 2
        |ORDER BY a.p_brand, k1, k2""".stripMargin,
    "join_bloom_prefilter" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "join_nullsafe" ->
      """WITH a AS (SELECT NULLIF(l_returnflag, 'N') AS k, l_linestatus,
        |  COUNT(*) AS n FROM lineitem GROUP BY 1, 2),
        |b AS (SELECT NULLIF(l_returnflag, 'N') AS k2,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        | FROM lineitem GROUP BY 1)
        |SELECT a.k, a.l_linestatus, a.n, b.qty
        |FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k2
        |ORDER BY a.k NULLS FIRST, a.l_linestatus""".stripMargin,
    "join_inner" ->
      """SELECT o_orderpriority,
        | CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "join_broadcast" ->
      """SELECT r_name, COUNT(*) AS n_cust,
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "join_left_outer" ->
      """SELECT o_orderkey, COUNT(l_orderkey) AS n_big,
        | COALESCE(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS qty
        |FROM orders LEFT JOIN lineitem
        | ON o_orderkey = l_orderkey AND l_quantity >= 45
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,
    "join_right_outer" ->
      """SELECT p_partkey, COUNT(l_partkey) AS n_heavy
        |FROM lineitem RIGHT JOIN part
        | ON l_partkey = p_partkey AND l_quantity >= 48
        |GROUP BY p_partkey ORDER BY p_partkey""".stripMargin,
    "join_full_outer" ->
      """SELECT COALESCE(ca.c_nationkey, sa.s_nationkey) AS nationkey,
        | COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
        |FROM (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey) ca
        |FULL OUTER JOIN (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey) sa
        | ON ca.c_nationkey = sa.s_nationkey
        |ORDER BY nationkey""".stripMargin,
    "join_semi" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "join_anti" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "join_theta" ->
      """SELECT s1.s_suppkey AS s_suppkey, COUNT(s2.s_suppkey) AS n_richer
        |FROM supplier s1 LEFT JOIN supplier s2
        | ON s1.s_nationkey = s2.s_nationkey AND s1.s_acctbal < s2.s_acctbal
        |GROUP BY s1.s_suppkey ORDER BY s_suppkey""".stripMargin,
    "join_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,
    "join_interval" ->
      """SELECT s.event_id AS signup_id, COUNT(e.event_id) AS n_events_1h
        |FROM (SELECT * FROM events WHERE event_type = 'signup') s
        |LEFT JOIN events e
        | ON e.user_id = s.user_id AND e.ts >= s.ts
        | AND e.ts < s.ts + INTERVAL 1 HOUR
        |GROUP BY s.event_id ORDER BY signup_id""".stripMargin,
    "join_asof" ->
      """SELECT p.event_id AS purchase_id, CAST(MAX(c.ts) AS TIMESTAMP) AS asof_click_ts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        | ON c.user_id = p.user_id AND c.ts <= p.ts
        |GROUP BY p.event_id ORDER BY purchase_id""".stripMargin,
    "join_asof_nearest" ->
      """WITH p AS (
        |  SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, ts FROM events WHERE event_type = 'click'),
        |best AS (
        |  SELECT p.event_id AS purchase_id, c.ts AS cts,
        |    ROW_NUMBER() OVER (PARTITION BY p.event_id
        |      ORDER BY ABS(date_diff('second', c.ts, p.ts)),
        |        CASE WHEN c.ts <= p.ts THEN 0 ELSE 1 END,
        |        CASE WHEN c.ts <= p.ts THEN -epoch_us(c.ts)
        |          ELSE epoch_us(c.ts) END) AS rn
        |  FROM p LEFT JOIN c ON c.user_id = p.user_id)
        |SELECT purchase_id, CAST(cts AS TIMESTAMP) AS nearest_click_ts
        |FROM best WHERE rn = 1 ORDER BY purchase_id""".stripMargin)
}

package graft.queries

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline operators beyond per-pair dedup (SURVEY.md §2b
  * LLM-pipeline extensions): duplicate-cluster resolution (connected
  * components over the near-dup pair graph), train/benchmark n-gram
  * decontamination, and a C4-style document quality filter.
  *
  * Scale notes (100 TB):
  *  - Connected components runs min-label propagation WITH pointer
  *    jumping: each iteration is two hash joins (neighbor min over
  *    edges ⋈ labels, then label := label[label]), which halves chain
  *    depth per round → O(log diameter) rounds. Near-dup components are
  *    shallow (pairs / small cliques), so 2–3 rounds in practice. The
  *    driver holds ONE aggregate (the label-sum) per round for the
  *    fixpoint test, never the vertex set. Lineage is truncated per
  *    round (localCheckpoint) so plans do not grow with iterations.
  *    Hitting the round cap without convergence throws — unconverged
  *    labels are wrong answers and must never be returned silently.
  *  - Decontamination is the shuffle-on-shingle inverted-index join the
  *    dedup family already uses: the benchmark side is tiny relative to
  *    the train corpus (and broadcastable at need); only colliding
  *    shingles cross the network.
  *  - The quality filter is a pure narrow map — embarrassingly parallel,
  *    no shuffle, evaluated entirely inside whole-stage codegen.
  */
object PipelineQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Resolve near-duplicate PAIRS into duplicate CLUSTERS: connected
    * components over the exact-Jaccard ≥ 0.5 graph, each doc labeled
    * with the minimum doc_id in its component (the canonical keeper).
    * Exact input pairs → exact components → SQL-oracle-able via a
    * recursive transitive closure. */
  def dedupCluster(spark: SparkSession, dir: String): DataFrame = {
    val pairs = DedupQueries.jaccardDedup(spark, dir)
      .select(col("d1"), col("d2"))
    val edges = pairs
      .union(pairs.select(col("d2"), col("d1")))
      .toDF("src", "dst")
      .localCheckpoint()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    // Min-label propagation to fixpoint. Labels only ever decrease, so
    // the label-sum is a strictly decreasing convergence witness; the
    // driver never materializes more than that one number.
    val MaxRounds = 30
    var prevSum = Option.empty[Long]
    var converged = false
    var rounds = 0
    while (!converged && rounds < MaxRounds) {
      val nbr = edges.join(labels, col("dst") === col("id"))
        .groupBy(col("src")).agg(min(col("label")).as("nbl"))
      val propagated = labels.join(nbr, col("id") === col("src"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbl"), col("label"))).as("label"))
      // pointer jumping: label := label[label]. Every label value IS a
      // vertex id (labels start as ids and only take neighbor label
      // values), so the self-join hits; chain depth halves per round,
      // making total rounds O(log diameter) instead of O(diameter).
      val reps = propagated
        .select(col("id").as("rid"), col("label").as("rlabel"))
      labels = propagated.join(reps, col("label") === col("rid"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("rlabel"), col("label")))
            .as("label"))
        .localCheckpoint()
      val s = labels.agg(sum(col("label"))).collect()(0)
      val cur = if (s.isNullAt(0)) Some(0L) else Some(s.getLong(0))
      converged = prevSum == cur
      prevSum = cur
      rounds += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"dedup_cluster: min-label propagation did not converge within " +
          s"$MaxRounds rounds — refusing to return unconverged cluster labels")
    labels.select(col("id").as("doc_id"), col("label").as("cluster_rep"))
      .orderBy(col("doc_id"))
  }

  /** Leakage-safe train/eval split: an 80/20 document split where
    * near-duplicates NEVER straddle the boundary — the split key is
    * the dup-cluster representative ([[dedupCluster]]'s min-label
    * component id, the doc's own id when unclustered), hashed with
    * the repo's engine-independent multiplicative hash. Splitting on
    * the raw doc id leaks eval content into training whenever a
    * near-copy lands on the other side; splitting on the component
    * id closes that by construction. At 100 TB this is the same two
    * shuffles the cluster pass already costs plus one hash-join of
    * the (small) cluster map back to the corpus — the hash itself is
    * a pushdown-friendly integer filter, reproducible in any engine. */
  def splitLeakageSafe(spark: SparkSession, dir: String): DataFrame = {
    val clusters = dedupCluster(spark, dir)
      .select(col("doc_id"), col("cluster_rep"))
    Tables.documents(spark, dir).select(col("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_rep"), col("doc_id")).as("rep"))
      .withColumn("split",
        when(col("rep") % 2147483648L * 2654435761L % 4294967296L % 10 < 8,
          lit("train")).otherwise(lit("eval")))
      .select(col("doc_id"), col("rep"), col("split"))
      .orderBy(col("doc_id"))
  }

  /** The shared 5-gram shingle stream: (doc_id, source, shingle) via the
    * native Generator (ShingleGenExpr) instead of explode(shingles()) —
    * distinct 5-grams stream out of GenerateExec per doc with no
    * intermediate array materialization; < 5-word docs vanish like the
    * non-outer generate they are. */
  private def shingleStream(spark: SparkSession, dir: String): DataFrame =
    graft.functions.ShingleGenExpr(
      fanOut(Tables.documents(spark, dir))
        .select(col("doc_id"), col("source"), words(col("text")).as("w")),
      col("w"), 5)
      .select(col("doc_id"), col("source"), col("shingle"))

  /** The shared decontamination tail: candidate train shingles join the
    * exact benchmark index; per-doc distinct-collision counts. */
  private def decontamConfirm(train: DataFrame, bench: DataFrame)
      : DataFrame =
    train.join(bench, "shingle")
      .groupBy(col("train_id"))
      .agg(count_distinct(col("shingle")).as("n_shared"),
        count_distinct(col("bench_id")).as("n_bench_docs"))
      .select(col("train_id").as("doc_id"), col("n_shared"),
        col("n_bench_docs"))
      .orderBy(col("doc_id"))

  /** Train/benchmark decontamination: flag every non-benchmark document
    * sharing at least one 5-word shingle with the benchmark slice
    * (source = src0), with how many distinct shingles and benchmark docs
    * it collides with. */
  def textDecontam(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingleStream(spark, dir)
    val bench = sh.filter(col("source") === "src0")
      .select(col("shingle"), col("doc_id").as("bench_id"))
    val train = sh.filter(col("source") =!= "src0")
      .select(col("doc_id").as("train_id"), col("shingle"))
    decontamConfirm(train, bench)
  }

  /** Bloom-prefiltered decontamination — the 100 TB shape of
    * [[textDecontam]]. The benchmark side is a FIXED eval set (tiny
    * relative to the corpus), so instead of shuffling every train
    * shingle into the inverted-index join, build one Bloom filter over
    * xxhash64(benchmark shingle) (a few MB regardless of corpus size),
    * ship it once as a plan literal, and drop ~all clean shingles in a
    * narrow codegen'd pass BEFORE the shuffle. Semantics stay EXACT: the
    * Bloom has no false negatives and survivors are re-checked by the
    * exact equi join, so false positives only cost shuffle bytes — the
    * declared oracle is [[textDecontam]]'s SQL verbatim.
    *
    * Same probe machinery as joinQueries.bloomPrefilterJoin: the native
    * BloomFilterMightContain expression (what InjectRuntimeFilter
    * plants) over xxhash64(shingle), NOT a Scala UDF — it stays inside
    * whole-stage codegen and the serialized sketch ships once as a
    * literal instead of per-task via a closure. Eager at construction
    * like every sketch build: the sizing count and the Bloom aggregation
    * are Spark jobs over the SMALL benchmark side only. */
  def textDecontamBloom(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingleStream(spark, dir)
    val bench = sh.filter(col("source") === "src0")
      .select(col("shingle"), col("doc_id").as("bench_id"))
    val benchHashes = bench
      .select(xxhash64(col("shingle")).as("h")).distinct()
    val expected = math.max(benchHashes.count(), 64L)
    val bf = benchHashes.stat.bloomFilter("h", expected, 0.01)
    val might = bloomMightContain(spark, bf, xxhash64(col("shingle")))
    val train = sh.filter(col("source") =!= "src0")
      .select(col("doc_id").as("train_id"), col("shingle"))
      .filter(might)
    decontamConfirm(train, bench)
  }

  /** WebDataset-style SHARD PACKING: assign documents (in doc_id
    * order) to fixed-byte-budget training shards — the layout step
    * between curation and the dataloader. The global running byte sum
    * is computed as a DISTRIBUTED PREFIX SUM, not a global-order
    * window (which would funnel 100 TB through one partition):
    *  1. deterministic range buckets from the key itself (doc_id div
    *     span — no RangePartitioner sampling, so the two passes cannot
    *     disagree on boundaries);
    *  2. per-bucket byte totals — a 16-row aggregate;
    *  3. driver prefix-sums the 16 longs, broadcasts bucket offsets;
    *  4. per-bucket running sum + offset = the exact global cumsum,
    *     every bucket in parallel.
    * shard_id = (cum − n_bytes) / budget, i.e. a doc starts the next
    * shard when the budget is exhausted. Pure integer arithmetic. */
  def shardPack(spark: SparkSession, dir: String): DataFrame = {
    val Budget = 16384L
    val Buckets = 16L
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), length(col("text")).cast("long").as("n_bytes"))
    val maxRow = d.agg(max(col("doc_id"))).collect()(0)
    if (maxRow.isNullAt(0)) // empty corpus: empty shard plan
      return d.select(col("doc_id"), col("n_bytes"),
        lit(0L).as("shard_id")).limit(0)
    val maxId = maxRow.getLong(0)
    val span = maxId / Buckets + 1L
    val bucketed = d.withColumn("bkt", expr(s"doc_id div $span"))
    val totals = bucketed.groupBy(col("bkt"))
      .agg(sum(col("n_bytes")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val offsets = (0L until Buckets).scanLeft(0L)(
      (acc, b) => acc + totals.getOrElse(b, 0L)).dropRight(1)
    val offDf = broadcast(
      spark.createDataFrame(spark.sparkContext.parallelize(
          (0L until Buckets).map(b => org.apache.spark.sql.Row(b, offsets(b.toInt))), 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("bkt",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("off",
            org.apache.spark.sql.types.LongType, nullable = false)))))
    val w = Window.partitionBy(col("bkt")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed.join(offDf, "bkt")
      .withColumn("cum", sum(col("n_bytes")).over(w) + col("off"))
      .select(col("doc_id"), col("n_bytes"),
        expr(s"(cum - n_bytes) div $Budget").as("shard_id"))
      .orderBy(col("doc_id"))
  }

  private val StopPattern = "\\b(the|a|and|of)\\b"

  /** C4-style quality gate: word-count bounds, mean-word-length band,
    * minimum stopword ratio; emits the metrics, the keep bit, and the
    * first failing rule. Pure integer/ratio arithmetic → identical in
    * any engine. */
  def textQualityFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"),
        size(split(col("text"), " ")).cast("long").as("n_words"),
        length(expr("replace(text, ' ', '')")).cast("long").as("n_letters"),
        regexp_count(col("text"), lit(StopPattern)).cast("long")
          .as("n_stop"))
      .select(col("doc_id"), col("n_words"),
        round(col("n_letters") / col("n_words"), 4).as("mean_wlen"),
        round(col("n_stop") / col("n_words"), 4).as("stop_ratio"))
      .withColumn("reason",
        when(col("n_words") < 25 || col("n_words") > 90, "length")
          .when(col("mean_wlen") < 4.2 || col("mean_wlen") > 4.8, "word_len")
          .when(col("stop_ratio") < 0.02, "stopwords")
          .otherwise("ok"))
      .withColumn("keep", (col("reason") === "ok").cast("int"))
      .orderBy(col("doc_id"))

  /** Target training mixture, language → weight in per-mille. */
  private val MixWeights: Seq[(String, Long)] =
    Seq("en" -> 300L, "de" -> 200L, "es" -> 200L, "fr" -> 150L,
      "zh" -> 150L)

  /** Training-mixture sampler: downsample each language so the kept
    * character mass follows the target mixture [[MixWeights]], keeping
    * the largest total the corpus supports (the scarcest language
    * relative to its weight is kept whole; every other language is
    * thinned to match). Selection is the corpus-wide deterministic
    * multiplicative hash (same family as `sample_hash`), so membership
    * is reproducible and engine-independent — the property a training
    * pipeline needs for resumable, auditable mixes.
    *
    * All rate arithmetic is integer (`DIV`), so the oracle is
    * bit-exact: rate_ppm(l) = min over languages m of
    * t_m·w_l·10⁶ DIV (w_m·t_l) — the floor of the true rational rate
    * (floor commutes with min), so the binding language's own m=l term
    * makes its rate EXACTLY 10⁶ by construction, not by divisibility
    * luck (an intermediate floored "budget" loses that invariant
    * whenever w ∤ t·1000). int64 holds the t·w·10⁶ products only to
    * ~3e10 chars per language (Long.MaxValue / (w·10⁶) at w=300), and
    * Spark's non-ANSI multiply wraps silently past that — so a 100 TB
    * corpus MUST compute the rate table in DECIMAL(38,0); the five-row
    * table costs nothing either way.
    *
    * Scale shape: the rate table is one tiny aggregation + 5×5 self
    * cross (rows = language count) broadcast to the scan; the kept set
    * never shuffles raw text — one hash-agg on lang ends the
    * pipeline. */
  def mixWeighted(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val weights = spark.createDataFrame(MixWeights)
      .toDF("lang", "w_mille")
    val avail = docs.groupBy(col("lang"))
      .agg(sum(col("n_chars")).as("t_chars"))
      .join(broadcast(weights), "lang")
    val rates = avail
      .crossJoin(broadcast(avail.select(col("t_chars").as("tm"),
        col("w_mille").as("wm"))))
      .groupBy(col("lang"))
      .agg(min(expr("tm * w_mille * 1000000 DIV (wm * t_chars)"))
        .as("rate_ppm"))
    sampleByRatePpm(docs, rates)
  }

  /** Temperature-scaled multilingual mixture (the XLM-R/mT5 α-sampling
    * shape, α = 0.7): instead of fixed target weights
    * ([[mixWeighted]]), the keep rate is DERIVED from the data —
    * languages sample at (q_min/q_i)^(1−α), so low-resource languages
    * keep everything and high-resource ones downsample toward a
    * flattened distribution. Rates resolve to integer ppm (one pow per
    * LANGUAGE, not per row — a floor-boundary flip would need a ~1-ulp
    * libm disagreement landing within 1e-12 of an integer), membership
    * is the engine-independent multiplicative hash, so the exact same
    * corpus reproduces anywhere. Scale: one per-lang aggregate, a
    * |langs|-row broadcast, then a narrow filter — a single corpus
    * pass. */
  def mixTemperature(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val avail = docs.groupBy(col("lang"))
      .agg(sum(col("n_chars")).as("t_chars"))
    val rates = avail
      .crossJoin(broadcast(avail.agg(min(col("t_chars")).as("q_min"))))
      .select(col("lang"),
        floor(pow(col("q_min").cast("double") / col("t_chars"), 0.3)
          * 1000000).cast("long").as("rate_ppm"))
    sampleByRatePpm(docs, rates)
  }

  /** UPSAMPLING mixture — the other half of multilingual balancing:
    * low-resource languages REPEAT (multiple training epochs over the
    * same documents) toward the largest language's mass, capped at 4
    * epochs (unbounded repetition degrades models; the cap is the
    * standard knob). Integer-exact end to end: the per-language rate
    * is `min(4e6, q_max·10⁶ DIV q_i)` ppm (≥ 10⁶ by construction),
    * each doc emits `rate DIV 10⁶` full copies plus one more when its
    * multiplicative hash lands under the fractional part — the same
    * engine-independent membership as the downsampling mixers. The
    * Spark side actually EMITS the copies (explode over a sequence —
    * the plan a training-data writer runs); the oracle folds the same
    * copy counts arithmetically, so the hash match proves the
    * emission is exactly the declared multiset. Scale: one corpus
    * pass, a |langs|-row broadcast, output bounded by 4× input. */
  def mixUpsample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val avail = docs.groupBy(col("lang"))
      .agg(sum(col("n_chars")).as("t_chars"))
    val rates = avail
      .crossJoin(broadcast(avail.agg(max(col("t_chars")).as("q_max"))))
      .select(col("lang"),
        least(lit(4000000L), expr("q_max * 1000000 DIV t_chars"))
          .as("rate_ppm"))
    docs
      .withColumn("h",
        expr("doc_id % 2147483648 * 2654435761 % 4294967296 % 1000000"))
      .join(broadcast(rates), "lang")
      .withColumn("n_copies",
        expr("rate_ppm DIV 1000000") +
          when(col("h") < col("rate_ppm") % 1000000, 1L).otherwise(0L))
      .select(col("lang"), col("rate_ppm"), col("n_chars"),
        explode(expr("sequence(1L, n_copies)")).as("copy_idx"))
      .groupBy(col("lang"), col("rate_ppm"))
      .agg(count(lit(1)).as("n_docs_emitted"),
        sum(col("n_chars")).as("chars_emitted"))
      .orderBy(col("lang"))
  }

  /** The shared mixture tail: ppm-rate membership by the
    * multiplicative hash, rolled up per language — [[mixWeighted]]
    * and [[mixTemperature]] differ only in how `rates` is derived.
    * The hash folds the id mod 2³¹ BEFORE the Knuth multiply
    * (2³¹ · 2654435761 < Long.MAX — AggQueries' documented idiom):
    * for ids ≥ ~3.5e9 the bare id·A product wraps silently in Spark's
    * non-ANSI multiply while DuckDB raises out-of-range, so the
    * unfolded form diverges from the oracle on any 64-bit id domain. */
  private def sampleByRatePpm(docs: DataFrame, rates: DataFrame)
      : DataFrame =
    docs
      .withColumn("h",
        expr("doc_id % 2147483648 * 2654435761 % 4294967296 % 1000000"))
      .join(broadcast(rates), "lang")
      .filter(col("h") < col("rate_ppm"))
      .groupBy(col("lang"), col("rate_ppm"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("chars_kept"))
      .select(col("lang"), col("rate_ppm"), col("n_docs"),
        col("chars_kept"))
      .orderBy(col("lang"))

  /** The end-to-end training-corpus curation composite — the pipeline
    * every pretraining dataset actually runs, as ONE declared plan:
    * quality gate (the `text_quality_filter` rules) → exact dedup
    * (keep the smallest doc_id per identical text) → mixture sampling
    * (the `mix_weighted` integer-exact rate algebra, computed over the
    * CURATED per-language mass, membership by the deterministic
    * multiplicative hash). Output: per language, curated count, the
    * sampling rate, and the sampled doc/word mass.
    *
    * Scale: three hash shuffles end-to-end (quality is a narrow map;
    * dedup groups by text — at 100 TB by a 128-bit text hash, same
    * plan; rates are a broadcast of |langs| rows; sampling is a
    * narrow filter). No stage holds more than one pass over the
    * corpus, and every decision is engine-independent, so the same
    * mixture reproduces anywhere. */
  def corpusCuration(spark: SparkSession, dir: String): DataFrame = {
    val q = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text"), col("n_chars"),
        size(split(col("text"), " ")).cast("long").as("n_words"),
        length(expr("replace(text, ' ', '')")).cast("long")
          .as("n_letters"),
        regexp_count(col("text"), lit(StopPattern)).cast("long")
          .as("n_stop"))
      .withColumn("mean_wlen", round(col("n_letters") / col("n_words"), 4))
      .withColumn("stop_ratio", round(col("n_stop") / col("n_words"), 4))
      .filter(col("n_words").between(25, 90) &&
        col("mean_wlen").between(4.2, 4.8) && col("stop_ratio") >= 0.02)
    val keep = q.groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))
    val curated = q.join(keep, Seq("text", "doc_id"))
      .select(col("doc_id"), col("lang"), col("n_chars"), col("n_words"))
    val weights = spark.createDataFrame(MixWeights).toDF("lang", "w_mille")
    val avail = curated.groupBy(col("lang"))
      .agg(sum(col("n_chars")).as("t_chars"))
      .join(broadcast(weights), "lang")
    val rates = avail
      .crossJoin(broadcast(avail.select(col("t_chars").as("tm"),
        col("w_mille").as("wm"))))
      .groupBy(col("lang"))
      .agg(min(expr("tm * w_mille * 1000000 DIV (wm * t_chars)"))
        .as("rate_ppm"))
    curated
      .withColumn("h",
        expr("doc_id % 2147483648 * 2654435761 % 4294967296 % 1000000"))
      .join(broadcast(rates), "lang")
      .withColumn("sampled", (col("h") < col("rate_ppm")).cast("long"))
      .groupBy(col("lang"), col("rate_ppm"))
      .agg(count(lit(1)).as("n_curated"),
        sum(col("sampled")).as("n_sampled"),
        sum(when(col("sampled") === 1L, col("n_words")).otherwise(0L))
          .as("words_sampled"))
      .orderBy(col("lang"))
  }

  /** Deterministic weighted PRIORITY SAMPLING (Duffield–Lund–Thorup
    * priority sampling): each document draws priority
    * q = w · C div (h + 1), where w = n_chars (the size weight), h
    * the engine-independent multiplicative hash (the uniform draw)
    * and C = 1e9 — integer-exact, so the same corpus selects the same
    * sample in any engine, with inclusion probability ∝ weight. The
    * per-language top-k=20 runs on the custom bounded-heap
    * `TopKPerGroupExec` (map-side K-bounded heaps per group, merged
    * on reduce) — NOT a row_number window, whose per-language
    * partition would funnel a language's entire corpus through one
    * task's sort at 100 TB. Ties break on doc_id for total
    * determinism. */
  def samplePriority(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id"), col("n_chars"),
        expr("n_chars * 1000000000 DIV " +
          "(doc_id % 2147483648 * 2654435761 % 4294967296 % 1000000 + 1)")
          .as("q"))
    graft.operators.TopKPerGroup(docs, Seq(col("lang")),
        struct((col("q") * -1L).as("neg_q"), col("doc_id")),
        descending = false, k = 20)
      .select(col("lang"), col("rn"), col("doc_id"), col("n_chars"),
        col("q"))
      .orderBy(col("lang"), col("rn"))
  }

  val defs: Map[String, Q] = Map(
    "dedup_cluster" -> (dedupCluster _),
    "sample_priority" -> (samplePriority _),
    "sample_split_safe" -> (splitLeakageSafe _),
    "text_decontam" -> (textDecontam _),
    "text_decontam_bloom" -> (textDecontamBloom _),
    "text_quality_filter" -> (textQualityFilter _),
    "pipeline_shard_pack" -> (shardPack _),
    "mix_weighted" -> (mixWeighted _),
    "mix_temperature" -> (mixTemperature _),
    "mix_upsample" -> (mixUpsample _),
    "pipeline_corpus_curation" -> (corpusCuration _))

  private val DecontamSql =
    """WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
      |  WHERE len(string_split(text, ' ')) >= 5),
      |sh AS (SELECT DISTINCT doc_id, source,
      |   w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] AS shingle
      |  FROM w, UNNEST(range(1, len(w) - 3)) AS t(i)),
      |bench AS (SELECT shingle, doc_id AS bench_id FROM sh WHERE source = 'src0'),
      |train AS (SELECT doc_id AS train_id, shingle FROM sh WHERE source <> 'src0')
      |SELECT train_id AS doc_id,
      | COUNT(DISTINCT t.shingle) AS n_shared,
      | COUNT(DISTINCT bench_id) AS n_bench_docs
      |FROM train t JOIN bench b ON t.shingle = b.shingle
      |GROUP BY train_id ORDER BY doc_id""".stripMargin

  /** The connected-components transitive closure over the exact-Jaccard
    * ≥ 0.5 graph, shared by the `dedup_cluster` oracle and the
    * leakage-safe split oracle. */
  private val ClusterCtes =
    """w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
      |  WHERE len(string_split(text, ' ')) >= 3),
      |sh AS (SELECT DISTINCT doc_id,
      |   w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      |  FROM w, UNNEST(range(1, len(w) - 1)) AS t(i)),
      |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
      |common AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS common
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |pairs AS (SELECT d1, d2 FROM common
      |  JOIN sizes s1 ON d1 = s1.doc_id
      |  JOIN sizes s2 ON d2 = s2.doc_id
      |  WHERE CAST(common AS DOUBLE) / CAST(s1.n_sh + s2.n_sh - common AS DOUBLE) >= 0.5),
      |edges AS (SELECT d1 AS a, d2 AS b FROM pairs
      |  UNION SELECT d2, d1 FROM pairs),
      |reach(a, b) AS (SELECT a, b FROM edges
      |  UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)""".stripMargin

  val sql: Map[String, String] = Map(
    "sample_priority" ->
      """WITH pri AS (
        |  SELECT lang, doc_id, n_chars,
        |    n_chars * 1000000000
        |      // (doc_id % 2147483648 * 2654435761 % 4294967296 % 1000000 + 1) AS q
        |  FROM documents),
        |ranked AS (
        |  SELECT lang, CAST(ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY q DESC, doc_id ASC) AS INT) AS rn,
        |    doc_id, n_chars, CAST(q AS BIGINT) AS q
        |  FROM pri)
        |SELECT lang, rn, doc_id, n_chars, q FROM ranked
        |WHERE rn <= 20 ORDER BY lang, rn""".stripMargin,
    "dedup_cluster" ->
      s"""WITH RECURSIVE $ClusterCtes
         |SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_rep
         |FROM reach GROUP BY a ORDER BY doc_id""".stripMargin,
    "sample_split_safe" ->
      s"""WITH RECURSIVE $ClusterCtes,
         |clusters AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_rep
         |  FROM reach GROUP BY a),
         |r AS (SELECT d.doc_id, COALESCE(c.cluster_rep, d.doc_id) AS rep
         |  FROM documents d LEFT JOIN clusters c ON d.doc_id = c.doc_id)
         |SELECT doc_id, rep,
         | CASE WHEN rep % 2147483648 * 2654435761 % 4294967296 % 10 < 8
         |  THEN 'train' ELSE 'eval' END AS split
         |FROM r ORDER BY doc_id""".stripMargin,
    "text_decontam" -> DecontamSql,
    // the Bloom pass is exact (no false negatives + equi-join confirm):
    // same oracle verbatim
    "text_decontam_bloom" -> DecontamSql,
    "pipeline_shard_pack" ->
      """WITH b AS (SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_bytes FROM documents),
        |c AS (SELECT doc_id, n_bytes,
        |  SUM(n_bytes) OVER (ORDER BY doc_id
        |    ROWS UNBOUNDED PRECEDING) AS cum FROM b)
        |SELECT doc_id, n_bytes,
        |  CAST((cum - n_bytes) // 16384 AS BIGINT) AS shard_id
        |FROM c ORDER BY doc_id""".stripMargin,
    "text_quality_filter" ->
      """WITH m AS (SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |  CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_letters,
        |  CAST(len(regexp_extract_all(text, '\b(the|a|and|of)\b')) AS BIGINT) AS n_stop
        | FROM documents),
        |r AS (SELECT doc_id, n_words,
        |  round(n_letters / n_words, 4) AS mean_wlen,
        |  round(n_stop / n_words, 4) AS stop_ratio FROM m)
        |SELECT doc_id, n_words, mean_wlen, stop_ratio,
        | CASE WHEN n_words < 25 OR n_words > 90 THEN 'length'
        |      WHEN mean_wlen < 4.2 OR mean_wlen > 4.8 THEN 'word_len'
        |      WHEN stop_ratio < 0.02 THEN 'stopwords'
        |      ELSE 'ok' END AS reason,
        | CAST(CASE WHEN n_words BETWEEN 25 AND 90
        |      AND mean_wlen BETWEEN 4.2 AND 4.8
        |      AND stop_ratio >= 0.02 THEN 1 ELSE 0 END AS INT) AS keep
        |FROM r ORDER BY doc_id""".stripMargin,
    "mix_upsample" ->
      """WITH avail AS (SELECT lang, SUM(n_chars) AS t_chars
        |  FROM documents GROUP BY lang),
        |q AS (SELECT MAX(t_chars) AS q_max FROM avail),
        |rates AS (SELECT lang,
        |  LEAST(4000000, q_max * 1000000 // t_chars) AS rate_ppm
        | FROM avail, q),
        |d AS (SELECT doc_id, lang, n_chars,
        |  doc_id % 2147483648 * 2654435761 % 4294967296 % 1000000 AS h
        | FROM documents),
        |c AS (SELECT d.lang, r.rate_ppm,
        |  (r.rate_ppm // 1000000) +
        |  (CASE WHEN d.h < r.rate_ppm % 1000000 THEN 1 ELSE 0 END)
        |    AS n_copies,
        |  d.n_chars
        | FROM d JOIN rates r ON r.lang = d.lang)
        |SELECT lang, CAST(rate_ppm AS BIGINT) AS rate_ppm,
        | CAST(SUM(n_copies) AS BIGINT) AS n_docs_emitted,
        | CAST(SUM(n_chars * n_copies) AS BIGINT) AS chars_emitted
        |FROM c GROUP BY lang, rate_ppm ORDER BY lang""".stripMargin,
    "mix_temperature" ->
      """WITH avail AS (SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS t_chars
        |  FROM documents GROUP BY lang),
        |qm AS (SELECT MIN(t_chars) AS q_min FROM avail),
        |rates AS (SELECT lang,
        |  CAST(floor(pow(CAST(q_min AS DOUBLE) / t_chars, 0.3) * 1000000)
        |   AS BIGINT) AS rate_ppm
        | FROM avail, qm)
        |SELECT d.lang, r.rate_ppm, COUNT(*) AS n_docs,
        | CAST(SUM(d.n_chars) AS BIGINT) AS chars_kept
        |FROM documents d JOIN rates r ON d.lang = r.lang
        |WHERE d.doc_id % 2147483648 * 2654435761 % 4294967296 % 1000000 < r.rate_ppm
        |GROUP BY d.lang, r.rate_ppm ORDER BY d.lang""".stripMargin,
    "mix_weighted" ->
      """WITH wts(lang, w_mille) AS (VALUES
        |  ('en', 300), ('de', 200), ('es', 200), ('fr', 150), ('zh', 150)),
        |avail AS (
        |  SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS t_chars, w_mille
        |  FROM documents JOIN wts USING (lang) GROUP BY lang, w_mille),
        |rates AS (
        |  SELECT a.lang,
        |   CAST(MIN(m.t_chars * a.w_mille * 1000000
        |     // (m.w_mille * a.t_chars)) AS BIGINT) AS rate_ppm
        |  FROM avail a CROSS JOIN avail m GROUP BY a.lang)
        |SELECT d.lang, r.rate_ppm, COUNT(*) AS n_docs,
        | CAST(SUM(d.n_chars) AS BIGINT) AS chars_kept
        |FROM documents d JOIN rates r ON d.lang = r.lang
        |WHERE d.doc_id % 2147483648 * 2654435761 % 4294967296 % 1000000 < r.rate_ppm
        |GROUP BY d.lang, r.rate_ppm ORDER BY d.lang""".stripMargin,
    "pipeline_corpus_curation" ->
      """WITH m AS (SELECT doc_id, lang, text, n_chars,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |  CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_letters,
        |  CAST(len(regexp_extract_all(text, '\b(the|a|and|of)\b')) AS BIGINT) AS n_stop
        | FROM documents),
        |q AS (SELECT * FROM m
        |  WHERE n_words BETWEEN 25 AND 90
        |    AND round(n_letters / n_words, 4) BETWEEN 4.2 AND 4.8
        |    AND round(n_stop / n_words, 4) >= 0.02),
        |keepd AS (SELECT text, MIN(doc_id) AS doc_id FROM q GROUP BY text),
        |curated AS (SELECT q.doc_id, q.lang, q.n_chars, q.n_words
        |  FROM q JOIN keepd
        |    ON q.text = keepd.text AND q.doc_id = keepd.doc_id),
        |wts(lang, w_mille) AS (VALUES
        |  ('en', 300), ('de', 200), ('es', 200), ('fr', 150), ('zh', 150)),
        |avail AS (
        |  SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS t_chars, w_mille
        |  FROM curated JOIN wts USING (lang) GROUP BY lang, w_mille),
        |rates AS (
        |  SELECT a.lang,
        |   CAST(MIN(m2.t_chars * a.w_mille * 1000000
        |     // (m2.w_mille * a.t_chars)) AS BIGINT) AS rate_ppm
        |  FROM avail a CROSS JOIN avail m2 GROUP BY a.lang)
        |SELECT c.lang, r.rate_ppm, COUNT(*) AS n_curated,
        | CAST(SUM(CASE WHEN c.doc_id % 2147483648 * 2654435761 % 4294967296 % 1000000
        |   < r.rate_ppm THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
        | CAST(SUM(CASE WHEN c.doc_id % 2147483648 * 2654435761 % 4294967296 % 1000000
        |   < r.rate_ppm THEN c.n_words ELSE 0 END) AS BIGINT)
        |   AS words_sampled
        |FROM curated c JOIN rates r ON c.lang = r.lang
        |GROUP BY c.lang, r.rate_ppm ORDER BY c.lang""".stripMargin)
}

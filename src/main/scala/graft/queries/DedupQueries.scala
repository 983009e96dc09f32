package graft.queries

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication surface over documents (SURVEY.md §2b LLM-pipeline):
  * exact (hash-groupBy), exact n-gram Jaccard (inverted-index join),
  * MinHash+LSH, SimHash banding.
  *
  * Scale design (100 TB):
  *  - exact dedup groups on a 256-bit digest, never on raw text — the
  *    shuffle carries 32 bytes + doc_id per row;
  *  - the Jaccard/LSH paths shuffle (shingle|band-signature, doc_id)
  *    pairs — candidate generation is an equi-join Catalyst plans as a
  *    shuffled hash join, and only *candidate pairs* (not the n²
  *    cartesian) reach verification;
  *  - hot shingles/buckets are the skew hazard at scale: AQE skew-join
  *    handles moderate skew, and a document-frequency cut (drop shingles
  *    appearing in > df_max docs, standard in web-scale dedup) bounds it —
  *    executable as [[jaccardPairsDfBounded]] (spec-pinned), kept out of
  *    the declared queries so the oracle stays exact.
  */
object DedupQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Exact dedup: one representative (min doc_id) per identical text.
    * Groups on sha2-256 so the shuffle key is fixed-width; the oracle
    * groups on raw text — identical output absent a SHA-256 collision. */
  def exactDedup(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(sha2(col("text"), 256).as("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))
      .orderBy(col("keep_id"))

  private val shCache =
    scala.collection.concurrent.TrieMap
      .empty[(SparkSession, String), DataFrame]

  /** Distinct (doc_id, 3-word-shingle) pairs — the inverted index both
    * near-dup paths share. Persisted once per (session, dataset): the
    * Jaccard and MinHash pipelines each reference it several times
    * (sizes + two join sides), and at corpus scale you materialize the
    * inverted index exactly once, not per consumer. Shingling runs
    * through the native Generator (ShingleGenExpr) — distinct 3-grams
    * stream out of GenerateExec with no per-doc array materialization. */
  private def shingleIndex(spark: SparkSession, dir: String): DataFrame =
    shCache.getOrElseUpdate((spark, dir),
      graft.functions.ShingleGenExpr(
        fanOut(Tables.documents(spark, dir))
          .select(col("doc_id"), words(col("text")).as("w")),
        col("w"), 3)
        .select(col("doc_id"), col("shingle"))
        .persist())

  private val jacCache =
    scala.collection.concurrent.TrieMap
      .empty[(SparkSession, String), DataFrame]

  /** Exact Jaccard ≥ 0.5 pairs via inverted-index self-join: doc pairs
    * sharing a shingle → common counts → |A∪B| from per-doc set sizes.
    * common/union is a small-int ratio — bit-exact in any engine.
    * Persisted once per (session, dataset): the pair set is consumed
    * again by the connected-components clustering
    * ([[PipelineQueries.dedupCluster]]) — at corpus scale the scored
    * pair table is materialized once, not per consumer. */
  def jaccardDedup(spark: SparkSession, dir: String): DataFrame =
    jacCache.getOrElseUpdate((spark, dir), jaccardPairs(spark, dir).persist())

  private def jaccardPairs(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingleIndex(spark, dir)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val common = sh.as("a")
      .join(sh.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.as("s1"), col("d1") === col("s1.doc_id"))
      .join(sizes.as("s2"), col("d2") === col("s2.doc_id"))
      .select(col("d1"), col("d2"),
        (col("common").cast("double") /
          (col("s1.n_sh") + col("s2.n_sh") - col("common")).cast("double"))
          .as("jaccard"))
      .filter(col("jaccard") >= 0.5)
      .orderBy(col("d1"), col("d2"))
  }

  /** Asymmetric CONTAINMENT dedup — doc-in-doc / quote detection:
    * containment = |sh(A) ∩ sh(B)| / min(|sh(A)|, |sh(B)|), the
    * smaller document's coverage by the pair's common shingles. Flags
    * near-complete INCLUSION that symmetric Jaccard misses entirely: a
    * 50-word passage embedded verbatim in a 5000-word page scores
    * Jaccard ≈ 0.01 but containment ≈ 1.0 — the shape quote/boilerplate
    * removal in a pretraining pipeline actually hunts. Same shared
    * inverted index and candidate join as the Jaccard path (one index
    * materialization serves all dedup consumers); the extra cost over
    * [[jaccardPairs]] is one `least`. Small-int ratio → bit-exact in
    * any engine. */
  def containmentDedup(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingleIndex(spark, dir)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val common = sh.as("a")
      .join(sh.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.as("s1"), col("d1") === col("s1.doc_id"))
      .join(sizes.as("s2"), col("d2") === col("s2.doc_id"))
      .select(
        when(col("s1.n_sh") <= col("s2.n_sh"), col("d1"))
          .otherwise(col("d2")).as("contained_id"),
        when(col("s1.n_sh") <= col("s2.n_sh"), col("d2"))
          .otherwise(col("d1")).as("container_id"),
        (col("common").cast("double") /
          least(col("s1.n_sh"), col("s2.n_sh")).cast("double"))
          .as("containment"))
      .filter(col("containment") >= 0.8)
      .orderBy(col("contained_id"), col("container_id"))
  }

  /** The web-scale skew bound named in the file doc, executable: drop
    * shingles occurring in more than `dfMax` documents from CANDIDATE
    * GENERATION (the self-join), keeping verification exact over the
    * full index. A shingle shared by df documents fans out into
    * df·(df−1)/2 join rows — boilerplate phrases ("all rights
    * reserved") make df ~ corpus size and the join quadratic in it;
    * the cut caps every join key's fan-out at dfMax²/2, which is what
    * AQE's skew split cannot do when a single KEY (not partition) is
    * hot. Semantics: strictly fewer candidates, never a false pair —
    * verification still scores true Jaccard on ALL shingles, so output
    * ⊆ the exact pair set, missing only pairs whose every common
    * shingle is hot (at a sane dfMax those are boilerplate-only
    * matches, the pairs web-scale dedup deliberately ignores).
    * Declared (oracle-gated) as `dedup_jaccard_dfcut` at
    * dfMax = [[DfCut]]; DedupSimSpec additionally pins containment,
    * the fan-out bound, and the no-op equality at dfMax = max df.
    * The declared `dedup_jaccard` stays uncut so its oracle is the
    * exact pair set. */
  private[graft] def jaccardPairsDfBounded(spark: SparkSession,
      dir: String, dfMax: Long): DataFrame = {
    val sh = shingleIndex(spark, dir)
    val hot = sh.groupBy(col("shingle"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > dfMax)
      .select(col("shingle"))
    val cold = sh.join(hot, Seq("shingle"), "left_anti")
    val candidates = cold.as("a")
      .join(cold.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    verifyJaccard(candidates, sh)
      .filter(col("jaccard") >= 0.5)
      .orderBy(col("d1"), col("d2"))
  }

  /** Declared cut for `dedup_jaccard_dfcut` — the shape that actually
    * ships at 100 TB, where dfMax is tuned to the corpus (a few
    * thousand for web text); 4 bites on the test fixture. */
  private[graft] val DfCut = 4L

  private val dfcutCache =
    scala.collection.concurrent.TrieMap
      .empty[(SparkSession, String), DataFrame]

  /** The df-bounded Jaccard as a first-class declared query: identical
    * semantics to [[jaccardPairsDfBounded]] at dfMax = [[DfCut]],
    * fully deterministic, restated exactly in DuckDB (same inverted
    * index plus a `HAVING count(*) > dfMax` hot-shingle cut).
    * Persisted once per (session, dataset) like [[jaccardDedup]]: at
    * corpus scale the scored pair table is materialized once, not per
    * consumer. */
  def jaccardDedupDfCut(spark: SparkSession, dir: String): DataFrame =
    dfcutCache.getOrElseUpdate((spark, dir),
      jaccardPairsDfBounded(spark, dir, DfCut).persist())

  private val NumHashes = graft.functions.MinHashAgg.NumHashes
  private val Bands = 8
  private val RowsPerBand = NumHashes / Bands

  /** MinHash signature columns mh0..mh31 via the single-pass typed
    * [[graft.functions.MinHashAgg]]: one xxhash64 per shingle + one
    * 32-long buffer per group in the shuffle, instead of 32 full
    * string hashes per shingle and 32 separate min-agg columns. */
  private def minhashSignatures(spark: SparkSession, sh: DataFrame)
      : DataFrame = {
    graft.functions.Registration.once(spark, "graft_minhash")(
      spark.udf.register("graft_minhash", udaf(graft.functions.MinHashAgg)))
    val sigs = sh
      .withColumn("h", hash64(col("shingle")))
      .groupBy(col("doc_id"))
      .agg(expr("graft_minhash(h)").as("mh"))
    sigs.select(col("doc_id") +:
      (0 until NumHashes).map(i =>
        element_at(col("mh"), i + 1).as(s"mh$i")): _*)
  }

  private val bandCache =
    scala.collection.concurrent.TrieMap
      .empty[(SparkSession, String), DataFrame]

  /** MinHash+LSH near-dup: band signatures → bucket join → candidate
    * pairs → exact-Jaccard verification ≥ 0.5. Candidate generation is
    * approximate (an LSH band miss is possible) but DETERMINISTIC: the
    * permutation family is splitmix64 over the portable md5-derived
    * base hash ([[graft.functions.TextFunctions.hash64]]), so the
    * full pipeline — signatures, banding, verification — is
    * reproduced bit-exactly by the DuckDB oracle ([[minhashOracleSql]])
    * and the query is hash-gated like any exact operator; ScalaTest
    * additionally checks recall against [[jaccardDedup]]. The
    * (doc, band, sig) table
    * is persisted once per (session, dataset): the bucket self-join
    * references it on BOTH sides, and without the cache the whole
    * signature aggregation (the expensive pass over every shingle) runs
    * twice — at corpus scale you materialize signatures once. */
  /** LSH bands for an arbitrary (doc_id, text) frame — the unit of
    * index maintenance: a streaming micro-batch of freshly ingested
    * docs turns into exactly these rows, probes the maintained index,
    * and then appends itself (StreamingSpec drives the loop). */
  def bandsOf(spark: SparkSession, docs: DataFrame): DataFrame =
    bandTable(spark,
      graft.functions.ShingleGenExpr(
        fanOut(docs).select(col("doc_id"), words(col("text")).as("w")),
        col("w"), 3)
        .select(col("doc_id"), col("shingle")))

  /** (doc, band, sig) rows for LSH banding — the shape both the batch
    * near-dup query and the incremental ingest index build from. */
  private def bandTable(spark: SparkSession, sh: DataFrame): DataFrame = {
    val sigs = minhashSignatures(spark, sh)
    val bandCols = (0 until Bands).map { b =>
      struct(lit(b).as("band"),
        concat_ws(":", (0 until RowsPerBand)
          .map(j => col(s"mh${b * RowsPerBand + j}")): _*).as("sig"))
    }
    sigs.select(col("doc_id"), explode(array(bandCols: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"),
        col("bs.sig").as("sig"))
  }

  def minhashDedup(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingleIndex(spark, dir)
    val bands = bandCache.getOrElseUpdate((spark, dir),
      bandTable(spark, sh).persist())
    val candidates = bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
      .distinct()
    verifyJaccard(candidates, sh)
      .filter(col("jaccard") >= 0.5)
      .orderBy(col("d1"), col("d2"))
  }

  /** Incremental near-dup detection over a GROWING corpus — the shape
    * ingest-time dedup actually runs at 100 TB: the existing corpus's
    * MinHash band index is PERSISTED (built once, here as an Arrow
    * layout; in production maintained by appending each batch's
    * bands), and a new ingest batch — the last ~10% of doc ids —
    * does full-text work (shingles → signatures) for ITS OWN docs
    * only. Candidates are (new × index) via the band-bucket equi-join
    * plus (new × new) within the batch; old×old pairs are never
    * re-examined, so per-ingest cost is O(batch + collisions), not
    * O(corpus²) re-dedup. Verification stays exact (true Jaccard over
    * the union shingle index, ≥ 0.5), output ⊆ `dedup_minhash`'s pair
    * set restricted to pairs touching the batch — fully deterministic
    * and hash-gated by the same splitmix64-literal oracle with the
    * batch cut restated as integer arithmetic. */
  def incrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingleIndex(spark, dir)
    // the ingest cut: docs with id >= (9·max)/10 are "the new batch";
    // integer arithmetic, restated identically in the oracle
    val maxId = graft.Tables.documents(spark, dir)
      .agg(max(col("doc_id"))).collect()(0).getLong(0)
    val cut = maxId * 9L / 10L
    // persisted base index — built once per process (read-only
    // fixture), read back like any table the pipeline maintains
    val indexDir = graft.Scratch.dir("mh_index", dir)
    graft.Fixtures.once(indexDir) {
      bandTable(spark, sh.filter(col("doc_id") < cut))
        .write.format("arrow").mode("overwrite").save(indexDir)
    }
    val oldBands = spark.read.format("arrow").load(indexDir)
    val newBands = newBandCache.getOrElseUpdate((spark, dir),
      bandTable(spark, sh.filter(col("doc_id") >= cut)).persist())
    // new × existing: the index side is only ever probed by band+sig
    val crossCand = newBands.as("x")
      .join(oldBands.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig"))
      .select(col("y.doc_id").as("d1"), col("x.doc_id").as("d2"))
    // new × new: dups inside one ingest batch
    val selfCand = newBands.as("x")
      .join(newBands.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
    val candidates = crossCand.unionByName(selfCand).distinct()
    verifyJaccard(candidates, sh)
      .filter(col("jaccard") >= 0.5)
      .orderBy(col("d1"), col("d2"))
  }

  private val newBandCache =
    scala.collection.concurrent.TrieMap
      .empty[(SparkSession, String), DataFrame]

  /** Exact Jaccard for an explicit candidate-pair set. */
  private def verifyJaccard(pairs: DataFrame, sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val common = pairs
      .join(sh.as("sa"), col("d1") === col("sa.doc_id"))
      .join(sh.as("sb"),
        col("d2") === col("sb.doc_id") &&
          col("sa.shingle") === col("sb.shingle"))
      .groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.as("z1"), col("d1") === col("z1.doc_id"))
      .join(sizes.as("z2"), col("d2") === col("z2.doc_id"))
      .select(col("d1"), col("d2"),
        (col("common").cast("double") /
          (col("z1.n_sh") + col("z2.n_sh") - col("common")).cast("double"))
          .as("jaccard"))
  }

  /** 64-bit SimHash: per-word xxhash64, signed bit votes (one vote per
    * occurrence — identical to tf-weighted votes per distinct word, but
    * needs no (doc, word) pre-aggregation, saving a full shuffle), bit
    * i set iff vote ≥ 0. Votes fold in the single-pass typed
    * [[graft.functions.SimHashAgg]] — one 64-long buffer per group in
    * the shuffle instead of 64 separate sum-aggregate columns. */
  private def simhash(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.Registration.once(spark, "graft_simhash")(
      spark.udf.register("graft_simhash", udaf(graft.functions.SimHashAgg)))
    fanOut(Tables.documents(spark, dir))
      .select(col("doc_id"), explode(words(col("text"))).as("word"))
      .withColumn("h", hash64(col("word")))
      .groupBy(col("doc_id"))
      .agg(expr("graft_simhash(h)").as("simhash"))
  }

  /** The 64-conditional-sum DataFrame formulation of the same
    * signature — kept as the cross-check oracle for the Aggregator
    * (DedupSimSpec proves them bit-equal). */
  private[graft] def simhashViaSums(spark: SparkSession, dir: String)
      : DataFrame = {
    val occ = fanOut(Tables.documents(spark, dir))
      .select(col("doc_id"), explode(words(col("text"))).as("word"))
      .withColumn("h", hash64(col("word")))
    val votes = (0 until 64).map { i =>
      sum(when(shiftrightunsigned(col("h"), i).bitwiseAND(1L) === 1L,
        lit(1L)).otherwise(lit(-1L))).as(s"v$i")
    }
    val voted = occ.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
    val sig: Column = (0 until 64).map { i =>
      when(col(s"v$i") >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    voted.select(col("doc_id"), sig.as("simhash"))
  }

  private val simBandCache =
    scala.collection.concurrent.TrieMap
      .empty[(SparkSession, String), DataFrame]

  /** SimHash near-dup: pigeonhole banding (4 × 16-bit bands — any pair
    * at Hamming distance ≤ 3 shares at least one exact band) → candidate
    * pairs → exact Hamming ≤ 3 via bit_count(xor). The banding is
    * recall-EXACT for the ≤ 3 cut (3 differing bits touch at most 3 of
    * the 4 bands), so the output is precisely "all pairs at Hamming
    * ≤ 3 of the signature map" — and with signatures over the portable
    * [[graft.functions.TextFunctions.hash64]] the DuckDB oracle
    * ([[simhashOracleSql]]) recomputes that map bit-exactly and takes
    * all pairs directly, no banding needed at oracle scale. Like the
    * MinHash path, the (doc, band-value) table persists once
    * per (session, dataset) so the signature fold does not run once per
    * self-join side. */
  def simhashDedup(spark: SparkSession, dir: String): DataFrame = {
    val bands = simBandCache.getOrElseUpdate((spark, dir),
      simhash(spark, dir).select(col("doc_id"), col("simhash"),
          explode(array((0 until 4).map(b =>
            struct(lit(b).as("band"),
              shiftrightunsigned(col("simhash"), b * 16)
                .bitwiseAND(0xFFFFL).as("bv"))): _*)).as("bs"))
        .select(col("doc_id"), col("simhash"),
          col("bs.band").as("band"), col("bs.bv").as("bv"))
        .persist())
    bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash")))
          .as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy(col("d1"), col("d2"))
  }

  // ---- DuckDB oracle for the MinHash/SimHash pipelines --------------
  // Both engines compute the identical signature map because every
  // step is pinned to portable primitives: base hash = first 16 hex
  // chars of md5 (TextFunctions.hash64), permutations = splitmix64
  // (xor / >>> / wraparound multiply — emulated below with HUGEINT
  // split multiplication since DuckDB integer ops overflow-check),
  // minima compared in SIGNED order (Spark longs) via the
  // sign-bit-flip trick on DuckDB's UBIGINT domain.

  /** `a * c mod 2^64` over UBIGINT operand `a` (an alias reference —
    * cheap to repeat) and HUGEINT constant literal `c`: split into
    * 32-bit halves so no intermediate exceeds INT128. */
  private def mulmod(a: String, c: String): String =
    s"((((($a) >> 32)::HUGEINT * $c % 4294967296) * 4294967296 + " +
      s"((($a) & 4294967295::UBIGINT)::HUGEINT * $c)) " +
      "% 18446744073709551616)::UBIGINT"

  private val SignBit = "9223372036854775808::UBIGINT"
  private val Md5Base = "('0x' || substr(md5(%s),1,16))::UBIGINT"

  /** The shared shingle CTEs (dedup_jaccard's formulation). */
  private val ShingleCtes =
    """w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
      |  WHERE len(string_split(text, ' ')) >= 3),
      |sh AS (SELECT DISTINCT doc_id,
      |   w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      |  FROM w, UNNEST(range(1, len(w) - 1)) AS t(i))""".stripMargin

  private[graft] def minhashOracleSql: String = minhashOracleSql("")

  /** `extraCand` appends to the candidate join condition — the
    * incremental variant cuts candidate generation to pairs whose
    * greater id is in the ingest batch (old×old pairs are exactly the
    * ones the persisted index never re-examines). */
  private[graft] def minhashOracleSql(extraCand: String): String = {
    // splitmix64 chains as lateral column aliases, one per permutation
    val mixCols = (0 until NumHashes).flatMap { i =>
      val seed = java.lang.Long.toUnsignedString(
        0x9E3779B97F4A7C15L * (i + 1))
      Seq(
        s"xor(h, $seed::UBIGINT) AS za$i",
        s"${mulmod(s"xor(za$i, za$i >> 30)",
          "13787848793156543929::HUGEINT")} AS zb$i",
        s"${mulmod(s"xor(zb$i, zb$i >> 27)",
          "10723151780598845931::HUGEINT")} AS zc$i",
        s"xor(zc$i, zc$i >> 31) AS h$i")
    }.mkString(",\n    ")
    val minCols = (0 until NumHashes).map(i =>
      s"xor(min(xor(h$i, $SignBit)), $SignBit) AS m$i").mkString(",\n    ")
    val bandSelects = (0 until Bands).map { b =>
      val sig = (0 until RowsPerBand)
        .map(j => s"m${b * RowsPerBand + j}::VARCHAR")
        .mkString(" || ':' || ")
      s"SELECT doc_id, $b AS band, $sig AS sig FROM mins"
    }.mkString("\n  UNION ALL ")
    s"""WITH $ShingleCtes,
       |hs AS (SELECT doc_id, ${Md5Base.format("shingle")} AS h,
       |    $mixCols
       |  FROM sh),
       |mins AS (SELECT doc_id,
       |    $minCols
       |  FROM hs GROUP BY doc_id),
       |bands AS (
       |  $bandSelects),
       |cand AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
       |  FROM bands x JOIN bands y
       |  ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id
       |  $extraCand),
       |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
       |common AS (SELECT c.d1, c.d2, COUNT(*) AS common
       |  FROM cand c
       |  JOIN sh a ON a.doc_id = c.d1
       |  JOIN sh b ON b.doc_id = c.d2 AND a.shingle = b.shingle
       |  GROUP BY c.d1, c.d2)
       |SELECT d1, d2,
       |  CAST(common AS DOUBLE) / CAST(s1.n_sh + s2.n_sh - common AS DOUBLE) AS jaccard
       |FROM common
       |JOIN sizes s1 ON d1 = s1.doc_id
       |JOIN sizes s2 ON d2 = s2.doc_id
       |WHERE CAST(common AS DOUBLE) / CAST(s1.n_sh + s2.n_sh - common AS DOUBLE) >= 0.5
       |ORDER BY d1, d2""".stripMargin
  }

  private[graft] def simhashOracleSql: String = {
    val voteCols = (0 until 64).map(i =>
      s"sum(CASE WHEN ((h >> $i) & 1::UBIGINT) = 1::UBIGINT " +
        s"THEN 1 ELSE -1 END) AS v$i").mkString(",\n    ")
    val sigSum = (0 until 64).map { i =>
      val pow = java.lang.Long.toUnsignedString(1L << i)
      s"CASE WHEN v$i >= 0 THEN $pow::UBIGINT ELSE 0::UBIGINT END"
    }.mkString(" + ")
    s"""WITH occ AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
       |  FROM documents),
       |hv AS (SELECT doc_id, ${Md5Base.format("word")} AS h FROM occ),
       |votes AS (SELECT doc_id,
       |    $voteCols
       |  FROM hv GROUP BY doc_id),
       |sigs AS (SELECT doc_id, ($sigSum) AS sig FROM votes)
       |SELECT x.doc_id AS d1, y.doc_id AS d2,
       |  bit_count(xor(x.sig, y.sig))::INTEGER AS hamming
       |FROM sigs x JOIN sigs y ON x.doc_id < y.doc_id
       |WHERE bit_count(xor(x.sig, y.sig)) <= 3
       |ORDER BY d1, d2""".stripMargin
  }

  /** Passage-level exact dedup (The Pile / RefinedWeb "substring
    * dedup" at word-window granularity): every document explodes into
    * W=8-token windows at stride 4, windows group by CONTENT, and each
    * document reports how many of its windows also occur in some other
    * document — the boilerplate/quotation signal doc-level Jaccard
    * misses (two long documents sharing one paragraph are near-0
    * Jaccard but that paragraph still leaks between train and test).
    *
    * Scale: one shuffle keyed by window text (at 100 TB: by a 64-bit
    * window hash — same plan, narrower key), one count-distinct per
    * window, one shuffled join back. No all-pairs anywhere: cost is
    * O(total windows), the exact shape web-scale passage dedup runs.
    * Stride 4 keeps window count at tokens/4 — the standard
    * coverage-vs-cost trade (stride 1 = full suffix coverage). */
  def passageDedup(spark: SparkSession, dir: String): DataFrame = {
    val wins = Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"),
        explode(expr("sequence(1, greatest(size(t) - 7, 1), 4)")).as("i"),
        col("t"))
      .select(col("doc_id"),
        concat_ws(" ", expr("slice(t, i, 8)")).as("passage"))
    val counts = wins.groupBy(col("passage"))
      .agg(countDistinct(col("doc_id")).as("d"))
    wins.join(counts, "passage")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("d") >= 2, 1L).otherwise(0L)).as("n_dup_windows"))
      .orderBy(col("doc_id"))
  }

  /** Exact SUBSTRING dedup at character grain (Lee et al.
    * "Deduplicating Training Data" — the suffix-array result,
    * re-expressed as the distributed two-phase plan a 100 TB corpus
    * actually runs): EVERY L=30-codepoint window (stride 1 — a
    * strided emit on both sides would miss runs whose offsets differ
    * mod the stride; exactness is the whole point) emits an 8-byte
    * ROLLING hash through the native
    * [[graft.functions.WindowHashGenExpr]] generator (O(1) per
    * character, no per-window substring materialization), hashes with
    * ≥2 distinct documents become candidates, and ONLY candidate
    * positions re-extract their actual substring for the byte-exact
    * confirm — so the big shuffle is keyed by longs (what makes
    * stride 1 affordable), collisions cost a substring check rather
    * than correctness, and the all-window byte shuffle a direct
    * group-by-substring would pay never happens. Detects EVERY
    * cross-document shared run of ≥ 30 codepoints. Output: per
    * document, total windows and how many are byte-exact shared. */
  def substringDedup(spark: SparkSession, dir: String): DataFrame = {
    val L = 30
    val S = 1
    // the explicit isnotnull matches what the candidate join would
    // infer on ITS copy of the subtree anyway (InferFiltersFromConstraints);
    // stating it once at the source keeps all three generation subtrees
    // canonically equal so the exchange below stays reusable
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .filter(col("doc_id").isNotNull)
    // ONE explicit hash exchange on `h` that every downstream consumer
    // (hot-hash aggregate, candidate join, per-doc window totals) reads
    // back: the three subtrees share the identical Exchange child, so
    // ReuseExchange/AQE-stage-reuse runs the expensive generation pass
    // (scan + WindowHashGenExpr roll over every character) exactly ONCE
    // and the consumers re-read its shuffle files. Without the pinned
    // repartition the aggregate's partial phase lives below its own
    // exchange, the subtrees stop being equal, and the generator +
    // corpus scan silently execute once per consumer — at 100 TB that
    // duplicated generation was the single largest wasted compute in
    // the library (round-15 verdict).
    val wins = graft.functions.WindowHashGenExpr(docs, col("text"), L, S)
      .select(col("doc_id"), col("pos"), col("h"))
      .repartition(col("h"))
    // "≥ 2 distinct docs" as min(doc) < max(doc): same predicate, but a
    // plain min/max aggregate instead of a two-level distinct expand.
    // The p0 conjunct is semantically void (pos ≥ 1 by construction);
    // it exists ONLY so `pos` stays in this consumer's required column
    // set — Catalyst pushes a per-consumer Project UNDER the shared
    // exchange, and if one consumer prunes `pos` the exchange subtrees
    // stop being canonically equal and reuse (hence single generation)
    // is lost. PlanShapeSpec pins gens==1 so a pruning change fails
    // loudly instead of silently doubling the 100 TB generation pass.
    val hot = wins.groupBy(col("h"))
      .agg(min(col("doc_id")).as("d0"), max(col("doc_id")).as("d1"),
        min(col("pos")).as("p0"))
      .filter(col("d0") < col("d1") && col("p0") >= 1)
      .select(col("h"))
    val cand = wins.join(hot, "h").select(col("doc_id"), col("pos"))
    // same single-exchange trick for the confirm phase: `confirmed` is
    // consumed by both the span aggregate and the span join; pinning
    // one exchange on `w` makes the candidate×docs join (the second and
    // last corpus scan) execute once instead of twice
    val confirmed = cand.join(docs, "doc_id")
      .select(col("doc_id"), expr(s"substring(text, pos, $L)").as("w"))
      .repartition(col("w"))
    val spans = confirmed.groupBy(col("w"))
      .agg(min(col("doc_id")).as("c0"), max(col("doc_id")).as("c1"))
      .filter(col("c0") < col("c1")).select(col("w"))
    val dup = confirmed.join(spans, "w")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup_windows"))
    // per-doc totals come from the reused window shuffle, not a third
    // corpus scan: windows emit at 1-based positions 1, S+1, …, maxpos,
    // so the per-doc window count IS floor((maxpos-1)/S)+1, and sub-L
    // docs (zero rows) drop out exactly like the old n_windows>0
    // filter. Derived from max(pos) rather than count(1) because a
    // count never references `pos` (NullPropagation folds count(pos) to
    // count(1)) and this consumer would prune it from under the shared
    // exchange, breaking reuse — see the note on `hot`
    val totals = wins.groupBy(col("doc_id"))
      .agg((floor((max(col("pos")) - 1) / lit(S)) + 1).cast("long")
        .as("n_windows"))
    totals.join(dup, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"))
      .orderBy(col("doc_id"))
  }

  /** Incremental EXACT substring dedup — the per-ingest form a 100 TB
    * pipeline actually runs (the [[incrementalDedup]] pattern applied
    * to the window-hash table): the EXISTING corpus's stride-1 window
    * hashes `(h, doc_id, pos)` are PERSISTED as an Arrow layout (built
    * once; in production maintained by appending each batch's own
    * windows), and a new ingest batch — the last ~10% of doc ids —
    * generates windows for ITS OWN text only. Candidates are
    * (batch × index) via the hash equi-join plus (batch × batch) via
    * the shared-hash cut; old×old windows are never re-examined, so
    * per-ingest generation cost is O(batch chars + collisions), not
    * O(corpus). Verification stays byte-exact: candidate positions on
    * BOTH sides re-extract their substring (old docs' text is fetched
    * only for index-matched docs) and a window counts as duplicated
    * iff its substring spans ≥ 2 distinct documents of the FULL
    * corpus — so the output is exactly [[substringDedup]]'s rows
    * restricted to batch documents (DedupSimSpec pins the equality,
    * the oracle restates the full pipeline with the same integer
    * batch cut). The index is a `bucket(16, h)` Arrow layout (the
    * graph-index pattern of `graph_pagerank_indexed`): the probe is a
    * storage-partitioned join, so the (petabyte) index side is never
    * exchanged — only the batch's distinct hashes shuffle, hashed by
    * the layout's own V2 bucket function. */
  def substringDedupIncremental(spark: SparkSession, dir: String)
      : DataFrame = {
    val L = 30
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.arrow.GraftCatalog].getName)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled",
      "true")
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .filter(col("doc_id").isNotNull)
    val maxId = Tables.documents(spark, dir)
      .agg(max(col("doc_id"))).collect()(0).getLong(0)
    val cut = maxId * 9L / 10L
    // persisted window-hash index over the existing corpus — built
    // once per process (read-only fixture), read back like any table
    // the pipeline maintains
    val indexDir = graft.Scratch.dir("substr_index", dir)
    graft.Fixtures.once(indexDir) {
      graft.functions.WindowHashGenExpr(
          docs.filter(col("doc_id") < cut), col("text"), L, 1)
        .select(col("h"), col("doc_id"), col("pos"))
        .write.format("arrow").option("bucketBy", "h")
        .option("numBuckets", "16").mode("overwrite").save(indexDir)
    }
    val index = spark.table(s"graft.arrow.`$indexDir`")
    // ONE pinned exchange on `h` for the batch generation, reused by
    // every consumer — the same single-generation trick (and the same
    // keep-pos-everywhere pruning constraint) as [[substringDedup]]
    val batchWins = graft.functions.WindowHashGenExpr(
        docs.filter(col("doc_id") >= cut), col("text"), L, 1)
      .select(col("doc_id"), col("pos"), col("h"))
      .repartition(col("h"))
    val hAgg = batchWins.groupBy(col("h"))
      .agg(min(col("doc_id")).as("d0"), max(col("doc_id")).as("d1"),
        min(col("pos")).as("p0"))
    // batch×batch: hashes shared by ≥2 distinct batch docs (the p0
    // conjunct is void — it keeps `pos` under the shared exchange)
    val hotBatch = hAgg.filter(col("d0") < col("d1") && col("p0") >= 1)
      .select(col("h"))
    // batch×index: index entries whose hash occurs in the batch at
    // all. The always-true conjuncts reference d0/d1/p0 so THIS copy
    // of the aggregate requires the same column set as hotBatch's —
    // otherwise ColumnPruning rewrites the probe's aggregate to
    // group-only and pushes a narrower Project under the shared
    // Exchange(h), breaking reuse and re-running the batch generation
    // (PlanShapeSpec pins gens==1 on this query too)
    val allBatchH = hAgg
      .filter(col("d0") <= col("d1") && col("p0") >= 1)
      .select(col("h"))
    val matchedOld = index.join(allBatchH, "h")
      .select(col("h"), col("doc_id"), col("pos"))
    val candH = hotBatch
      .unionByName(matchedOld.select(col("h"))).distinct()
    val cand = batchWins.join(candH, "h")
      .select(col("doc_id"), col("pos"))
    val confirmBatch = cand.join(docs, "doc_id")
      .select(col("doc_id"), expr(s"substring(text, pos, $L)").as("w"),
        lit(true).as("is_new"))
    val confirmOld = matchedOld.select(col("doc_id"), col("pos"))
      .join(docs, "doc_id")
      .select(col("doc_id"), expr(s"substring(text, pos, $L)").as("w"),
        lit(false).as("is_new"))
    val confirmed = confirmBatch.unionByName(confirmOld)
      .repartition(col("w"))
    val spans = confirmed.groupBy(col("w"))
      .agg(min(col("doc_id")).as("c0"), max(col("doc_id")).as("c1"))
      .filter(col("c0") < col("c1")).select(col("w"))
    val dup = confirmed.filter(col("is_new")).join(spans, "w")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup_windows"))
    // stride is 1 on both sides, so max(pos) IS the per-doc window
    // count (windows emit at positions 1..maxpos); referencing pos
    // also keeps the shared-exchange column set intact (see above)
    val totals = batchWins.groupBy(col("doc_id"))
      .agg(max(col("pos")).cast("long").as("n_windows"))
    totals.join(dup, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"))
      .orderBy(col("doc_id"))
  }

  // Bench evicts fixture memos at query-family boundaries; cached
  // relations are dropped by the same evictAll stroke (FixtureCaches)
  graft.FixtureCaches.register { () =>
    Seq(shCache, jacCache, dfcutCache, bandCache, newBandCache,
      simBandCache).foreach(_.clear())
  }

  val defs: Map[String, Q] = Map(
    "dedup_exact" -> (exactDedup _),
    "dedup_jaccard" -> (jaccardDedup _),
    "dedup_containment" -> (containmentDedup _),
    "dedup_jaccard_dfcut" -> (jaccardDedupDfCut _),
    "dedup_minhash" -> (minhashDedup _),
    "dedup_incremental" -> (incrementalDedup _),
    "dedup_simhash" -> (simhashDedup _),
    "dedup_passage" -> (passageDedup _),
    "dedup_substring" -> (substringDedup _),
    "dedup_substring_incremental" -> (substringDedupIncremental _))

  val sql: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin,
    "dedup_jaccard" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |sh AS (SELECT DISTINCT doc_id,
        |   w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
        |  FROM w, UNNEST(range(1, len(w) - 1)) AS t(i)),
        |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        |common AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS common
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT d1, d2,
        |  CAST(common AS DOUBLE) / CAST(s1.n_sh + s2.n_sh - common AS DOUBLE) AS jaccard
        |FROM common
        |JOIN sizes s1 ON d1 = s1.doc_id
        |JOIN sizes s2 ON d2 = s2.doc_id
        |WHERE CAST(common AS DOUBLE) / CAST(s1.n_sh + s2.n_sh - common AS DOUBLE) >= 0.5
        |ORDER BY d1, d2""".stripMargin,
    "dedup_containment" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |sh AS (SELECT DISTINCT doc_id,
        |   w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
        |  FROM w, UNNEST(range(1, len(w) - 1)) AS t(i)),
        |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        |common AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS common
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |sc AS (SELECT
        |   CASE WHEN s1.n_sh <= s2.n_sh THEN d1 ELSE d2 END AS contained_id,
        |   CASE WHEN s1.n_sh <= s2.n_sh THEN d2 ELSE d1 END AS container_id,
        |   CAST(common AS DOUBLE) / LEAST(s1.n_sh, s2.n_sh) AS containment
        |  FROM common
        |  JOIN sizes s1 ON d1 = s1.doc_id
        |  JOIN sizes s2 ON d2 = s2.doc_id)
        |SELECT contained_id, container_id, containment FROM sc
        |WHERE containment >= 0.8
        |ORDER BY contained_id, container_id""".stripMargin,
    "dedup_jaccard_dfcut" ->
      s"""WITH $ShingleCtes,
         |hot AS (SELECT shingle FROM sh GROUP BY shingle
         |  HAVING COUNT(*) > $DfCut),
         |cold AS (SELECT * FROM sh ANTI JOIN hot USING (shingle)),
         |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM cold a JOIN cold b
         |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
         |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
         |common AS (SELECT d1, d2, COUNT(*) AS common FROM cand
         |  JOIN sh sa ON d1 = sa.doc_id
         |  JOIN sh sb ON d2 = sb.doc_id AND sa.shingle = sb.shingle
         |  GROUP BY 1, 2)
         |SELECT d1, d2,
         |  CAST(common AS DOUBLE) / CAST(s1.n_sh + s2.n_sh - common AS DOUBLE) AS jaccard
         |FROM common
         |JOIN sizes s1 ON d1 = s1.doc_id
         |JOIN sizes s2 ON d2 = s2.doc_id
         |WHERE CAST(common AS DOUBLE) / CAST(s1.n_sh + s2.n_sh - common AS DOUBLE) >= 0.5
         |ORDER BY d1, d2""".stripMargin,
    "dedup_minhash" -> minhashOracleSql,
    "dedup_incremental" -> minhashOracleSql(
      "AND y.doc_id >= (SELECT (MAX(doc_id) * 9) // 10 FROM documents)"),
    "dedup_simhash" -> simhashOracleSql,
    "dedup_passage" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |win AS (
        |  SELECT doc_id, t,
        |    unnest(range(1, greatest(len(t) - 7, 1) + 1, 4)) AS i
        |  FROM toks),
        |w AS (
        |  SELECT doc_id, array_to_string(t[i:i+7], ' ') AS passage
        |  FROM win),
        |c AS (
        |  SELECT passage, COUNT(DISTINCT doc_id) AS d
        |  FROM w GROUP BY passage)
        |SELECT w.doc_id, COUNT(*) AS n_windows,
        |  CAST(SUM(CASE WHEN c.d >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dup_windows
        |FROM w JOIN c USING (passage)
        |GROUP BY w.doc_id ORDER BY w.doc_id""".stripMargin,
    "dedup_substring" ->
      """WITH win AS (
        |  SELECT doc_id, text,
        |    unnest(range(1, greatest(len(text) - 29, 0) + 1, 1)) AS i
        |  FROM documents),
        |wins AS (
        |  SELECT doc_id, substr(text, CAST(i AS INTEGER), 30) AS w
        |  FROM win),
        |spans AS (
        |  SELECT w, COUNT(DISTINCT doc_id) AS docs FROM wins GROUP BY w)
        |SELECT doc_id, COUNT(*) AS n_windows,
        |  CAST(SUM(CASE WHEN docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dup_windows
        |FROM wins JOIN spans USING (w)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // the incremental pipeline's output IS the full pipeline's rows
    // restricted to the ingest batch (old×old pairs never re-examined
    // ⇔ never reported); the oracle restates exactly that, with the
    // batch cut in the same integer arithmetic as dedup_incremental's
    "dedup_substring_incremental" ->
      """WITH win AS (
        |  SELECT doc_id, text,
        |    unnest(range(1, greatest(len(text) - 29, 0) + 1, 1)) AS i
        |  FROM documents),
        |wins AS (
        |  SELECT doc_id, substr(text, CAST(i AS INTEGER), 30) AS w
        |  FROM win),
        |spans AS (
        |  SELECT w, COUNT(DISTINCT doc_id) AS docs FROM wins GROUP BY w)
        |SELECT doc_id, COUNT(*) AS n_windows,
        |  CAST(SUM(CASE WHEN docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dup_windows
        |FROM wins JOIN spans USING (w)
        |WHERE doc_id >= (SELECT (MAX(doc_id) * 9) // 10 FROM documents)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin)
}

package graft.queries

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis surface over the documents corpus (SURVEY.md §2b
  * LLM-data-pipeline extensions): token counting, quality scoring,
  * language-ID heuristic, document fingerprinting, TF-IDF / BM25
  * relevance ranking. The per-document stats are narrow maps — no
  * shuffle except the output ordering, linear scaling with executors.
  * The ranking queries add the inverted-index shape: one shuffle to
  * (doc, term) counts, one to term document-frequencies, then
  * broadcast-joined scoring — at 100 TB the tf table is the big side
  * and everything else (df, scalars) broadcasts.
  */
object TextQueries {
  type Q = (SparkSession, String) => DataFrame

  private val Stopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Per-document stats: chars, words, tokens (BPE-ish regex), stopword
    * ratio, punctuation ratio, composite quality score. Ratios are exact
    * int/int double divisions — deterministic across engines. */
  def textStats(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val w = words(col("text"))
    val nWords = size(w).cast("int")
    val nStop = size(filter(w, x => x.isin(Stopwords.map(_.asInstanceOf[Any]): _*)))
      .cast("int")
    val nPunct = regexp_count(col("text"), lit("[^A-Za-z0-9\\s]")).cast("int")
    val nChars = length(col("text")).cast("int")
    val stopRatio = nStop.cast("double") / nWords.cast("double")
    val punctRatio = nPunct.cast("double") / nChars.cast("double")
    val lenScore = least(nWords.cast("double") / lit(100.0), lit(1.0))
    d.select(
        col("doc_id"), col("lang"), col("source"),
        nChars.as("n_chars_txt"),
        nWords.as("n_words"),
        tokenCount(col("text")).cast("int").as("n_tokens"),
        round(stopRatio, 6).as("stopword_ratio"),
        round(punctRatio, 6).as("punct_ratio"),
        round(lit(0.5) * stopRatio + lit(0.3) * lenScore
          + lit(0.2) * (lit(1.0) - punctRatio), 6).as("quality_score"))
      .orderBy(col("doc_id"))
  }

  /** Language-ID heuristic: score marker n-grams per candidate language,
    * pick the argmax (deterministic tie order). A real model would be a
    * trained n-gram profile; the *operator shape* — per-doc scoring +
    * argmax, no shuffle — is identical. */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val en = markerScore(col("text"), Seq("the ", "th", "er", "on"))
    val de = markerScore(col("text"), Seq("ch", "ei", "der ", "un"))
    val es = markerScore(col("text"), Seq("os", "ar", "el ", "la "))
    d.select(
        col("doc_id"), col("lang"),
        en.cast("int").as("score_en"),
        de.cast("int").as("score_de"),
        es.cast("int").as("score_es"),
        when(en >= de && en >= es, "en")
          .when(de >= es, "de")
          .otherwise("es").as("lang_pred"))
      .orderBy(col("doc_id"))
  }

  /** Rolling polynomial hash fingerprint per document. */
  def fingerprintQ(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))

  /** Within-document repetition score (training-data quality signal):
    * share of repeated 3-gram occurrences, 1 − distinct/total. High
    * ratio = templated / degenerate text. Narrow map after the fan-out
    * exchange (the shingle build dominates the one cheap rebalance —
    * same treatment as the sibling shingle/word-explode queries). */
  def repetitionQ(spark: SparkSession, dir: String): DataFrame =
    fanOut(Tables.documents(spark, dir))
      .select(col("doc_id"), words(col("text")).as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"),
        (size(col("w")) - 2).cast("long").as("n_grams"),
        size(shingles(col("w"), 3)).cast("long").as("n_distinct"))
      .select(col("doc_id"), col("n_grams"), col("n_distinct"),
        round(lit(1.0) - col("n_distinct") / col("n_grams"), 4)
          .as("rep_ratio"))
      .orderBy(col("doc_id"))

  /** TF-IDF: global top-30 (doc, term) pairs by tf·ln((N+1)/(df+1)).
    * tf/df/N are exact counts; the single ln is rounded at 6 decimals
    * (the established float-ranking convention), ties broken by
    * (doc_id, word). */
  def textTfidf(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val tf = fanOut(docs)
      .select(col("doc_id"), explode(words(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    tf.join(dfreq, "word")
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("word"), col("tf"), col("df"),
        round(col("tf") *
          log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))), 6)
          .as("tfidf"))
      .orderBy(col("tfidf").desc, col("doc_id"), col("word"))
      .limit(30)
  }

  private val Bm25Terms = Seq("hash", "join", "scan")

  /** BM25 (k1=1.2, b=0.75) document ranking for a fixed query-term set.
    * Per-term scores are combined by FIXED-ORDER conditional sums (one
    * term per sum, so each group adds exactly one non-zero addend —
    * order-independent), keeping the double arithmetic engine-exact up
    * to the final round(6). */
  def textBm25(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val dl = docs.select(col("doc_id"),
      size(words(col("text"))).cast("long").as("dl"))
    val avgdl = dl.agg(davg(col("dl"), 4).as("avgdl"))
    val tf = fanOut(docs)
      .select(col("doc_id"), explode(words(col("text"))).as("word"))
      .filter(col("word").isin(Bm25Terms.map(_.asInstanceOf[Any]): _*))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val sc = log(lit(1.0) +
        (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
      (col("tf") * lit(2.2)) /
      (col("tf") + lit(1.2) *
        (lit(1.0) - lit(0.75) + lit(0.75) * col("dl") / col("avgdl")))
    val scored = tf.join(dfreq, "word").join(dl, "doc_id")
      .crossJoin(broadcast(avgdl)).crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("word"), sc.as("sc"))
    scored.groupBy(col("doc_id"))
      .agg(round(Bm25Terms.map(t =>
          sum(when(col("word") === t, col("sc")).otherwise(lit(0.0))))
        .reduce(_ + _), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(20)
  }

  /** RAG-prep chunking: split every document into overlapping word
    * windows (50 words at stride 40 → 10-word overlap), one output row
    * per chunk with its index and word count. A generate-only narrow
    * op — `posexplode(sequence(...))` + `slice` stream inside codegen
    * with no shuffle until the presentation sort, so at 100 TB
    * chunking is scan-bound and embarrassingly parallel. Tail chunks
    * keep whatever words remain (real chunkers keep or merge tails;
    * keeping them makes the op total and the oracle exact). */
  def textChunk(spark: SparkSession, dir: String): DataFrame = {
    val W = 50
    val S = 40
    Tables.documents(spark, dir)
      // explicit null contract: a NULL text chunks to nothing (Spark
      // would otherwise emit one empty chunk via greatest(NULL-1, 0)=0
      // while the oracle's range(NULL) emits none)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), words(col("text")).as("w"))
      .select(col("doc_id"), col("w"),
        posexplode(sequence(lit(0), greatest(size(col("w")) - 1, lit(0)),
          lit(S))))
      .select(col("doc_id"), col("pos").cast("int").as("chunk_idx"),
        concat_ws(" ", slice(col("w"), col("col") + 1, lit(W)))
          .as("chunk_text"),
        size(slice(col("w"), col("col") + 1, lit(W))).as("n_words"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  // PII/URL queries deterministically ENRICH each row first (emails,
  // phone numbers, URLs derived from doc fields) because the synthetic
  // corpus carries none — the scrub/extract logic then has real matches
  // on every row and the DuckDB oracle re-derives the same rows. The
  // operator shape is the production one: a narrow codegen'd
  // regexp_replace / regexp_extract_all map, no shuffle but the output
  // ordering, linear with executors at 100 TB.

  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "\\b\\d{3}-\\d{4}\\b"

  /** PII scrubbing (C4/CCNet-style redaction pass): replace emails and
    * phone numbers with typed placeholders; report per-doc match counts
    * and the redacted length so the oracle checks the full rewrite. */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val enriched = concat(col("text"),
      lit(" contact user"), col("doc_id"), lit("@example.com or 555-"),
      lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"))
    val scrubbed = regexp_replace(
      regexp_replace(enriched, EmailRe, "<EMAIL>"),
      PhoneRe, "<PHONE>")
    d.select(col("doc_id"),
        regexp_count(enriched, lit(EmailRe)).cast("int").as("n_emails"),
        regexp_count(enriched, lit(PhoneRe)).cast("int").as("n_phones"),
        length(enriched).cast("int").as("len_raw"),
        length(scrubbed).cast("int").as("len_scrubbed"))
      .orderBy(col("doc_id"))
  }

  /** BPE first-merge statistics (tokenizer-training data prep): count
    * every ADJACENT CHARACTER PAIR across the corpus's words and rank
    * the top-20 — exactly the statistic byte-pair-encoding training
    * computes to pick its first merge, run distributed instead of on
    * one machine's corpus sample. Two generators (words, then the
    * per-word pair positions) stream inside codegen; ONE hash
    * aggregation ends the plan, its output bounded by the pair
    * alphabet (≤ |charset|²) however large the corpus — at 100 TB the
    * job is scan-bound and the merge table it feeds stays kilobytes.
    * Substring-by-position keeps both engines character-exact. */
  def bpePairs(spark: SparkSession, dir: String): DataFrame =
    fanOut(Tables.documents(spark, dir))
      .select(explode(words(col("text"))).as("w"))
      .filter(char_length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, char_length(w) - 1), " +
          "i -> substring(w, i, 2))")).as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair").asc)
      .limit(20)

  /** URL domain extraction/rollup (crawl-curation shape): pull every
    * `scheme://host` from the text, explode, aggregate per domain. */
  def urlDomains(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val enriched = concat(lit("see https://"), col("source"),
      lit(".example.org/p/"), col("doc_id"),
      lit(" and http://cdn."), col("source"), lit(".example.net/x "),
      col("text"))
    d.select(col("doc_id"),
        explode(regexp_extract_all(enriched,
          lit("https?://([A-Za-z0-9.-]+)"), lit(1))).as("domain"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("domain"))
  }

  /** Count-based BIGRAM language-model estimation — the classic
    * distributed LM-training job (KenLM's count pass): per-document
    * bigram streams fold into corpus-wide count tables, and the
    * conditional probability p(w2|w1) = count(w1,w2)/count(w1·) falls
    * out of one join between the bigram and unigram-prefix aggregates.
    * Scale: two hash shuffles (bigram counts, prefix counts) over
    * fixed-width token pairs — the corpus text itself never shuffles;
    * the model (the output table) is vocabulary-sized, not
    * corpus-sized. Top-50 by count with total tie-break; probability
    * is a small-int ratio rounded at 6dp — engine-exact. */
  def textNgramLm(spark: SparkSession, dir: String): DataFrame = {
    val toks = fanOut(Tables.documents(spark, dir))
      .select(col("doc_id"), words(col("text")).as("w"))
    val bigrams = toks
      .select(posexplode(expr(
        "transform(slice(w, 1, size(w) - 1), (x, i) -> struct(x AS w1, w[i + 1] AS w2))"))
        .as(Seq("i", "bg")))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val counts = bigrams.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n_bigram"))
    val prefix = counts.groupBy(col("w1"))
      .agg(sum(col("n_bigram")).as("n_prefix"))
    counts.join(prefix, "w1")
      .select(col("w1"), col("w2"), col("n_bigram"),
        round(col("n_bigram").cast("double") / col("n_prefix"), 6)
          .as("p_cond"))
      .orderBy(col("n_bigram").desc, col("w1"), col("w2"))
      .limit(50)
  }

  /** LM-based quality scoring (the CCNet filter shape): every document
    * scored by its mean negative log-likelihood under the corpus
    * bigram LM ([[textNgramLm]]'s counts) — fluent, predictable text
    * scores low; gibberish and boilerplate-free noise score high. No
    * smoothing is needed: the LM is trained on the scored corpus, so
    * every bigram has mass. Scale shape: the LM is vocabulary²-bounded
    * (corpus-independent once counts saturate — broadcastable), the
    * scoring join shuffles on the bigram key once, and the per-doc
    * score is one hash aggregation.
    *
    * Determinism (this one bit THREE times, so the contract is now
    * absolute): the score is INTEGER END TO END with NO runtime
    * transcendental in EITHER engine. Round 12's formulation still
    * evaluated one libm `ln` per engine — round(-ln(p)·10⁴) — and the
    * driver's DuckDB disagreed with Spark's JDK on one bigram's
    * half-point (the "improbable" 1-ulp straddle happened; see
    * VERDICT r12 #1). Now the quantized term table is FITTED once on
    * the driver: the distinct (n_bigram, n_prefix) count pairs are
    * collected (LM metadata — bounded by the number of distinct
    * integer count pairs, far below vocabulary², the same
    * bounded-metadata move as the IVF centroid fit), `lp =
    * round(-ln(nb/np)·10⁴)` is computed by ONE JVM, and both engines
    * consume the identical BIGINT literals — Spark via a broadcast
    * lookup join, DuckDB via a restated VALUES table (the
    * fitted-constant oracle pattern of the IVF/PQ/LSH family). Terms
    * LONG-sum exactly; the mean is the FLOORED integer division
    * (sum·100) div n — micro-nats. The naive round(mean, 6)
    * formulation stays unusable: a mean of 1e-4-grid terms over n
    * lands EXACTLY on 6dp half-points for ~1 doc in 5, where Spark's
    * BigDecimal HALF_UP and DuckDB's scaled-multiply round
    * legitimately disagree. Floor of exact integers cannot. */
  def textPerplexity(spark: SparkSession, dir: String): DataFrame = {
    val toks = fanOut(Tables.documents(spark, dir))
      .select(col("doc_id"), words(col("text")).as("w"))
    val bg = toks
      .select(col("doc_id"), posexplode(expr(
        "transform(slice(w, 1, size(w) - 1), (x, i) -> struct(x AS w1, w[i + 1] AS w2))"))
        .as(Seq("i", "bg")))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    // persisted: counts feeds both sides of the LM join (itself and
    // the prefix rollup) — vocabulary²-bounded, so caching it is cheap
    // at any corpus scale, unlike the exploded bigram stream, which is
    // corpus-sized and deliberately recomputed (a narrow re-explode
    // beats caching 100 TB of bigrams)
    val counts = bg.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n_bigram"))
      .persist()
    val prefix = counts.groupBy(col("w1"))
      .agg(sum(col("n_bigram")).as("n_prefix"))
    val lm = counts.join(prefix, "w1")
    val pairs = lpCache.getOrElseUpdate((spark, dir), {
      lm.select(col("n_bigram"), col("n_prefix")).distinct()
        .collect()
        .map { r =>
          val nb = r.getLong(0); val np = r.getLong(1)
          (nb, np, Math.round(-Math.log(nb.toDouble / np) * 10000.0))
        }
        .sortBy(t => (t._1, t._2)).toSeq
    })
    fittedLpPairs = Some(pairs)
    import spark.implicits._
    val lpDf = pairs.toDF("n_bigram", "n_prefix", "lp")
    bg.join(lm, Seq("w1", "w2"))
      .join(broadcast(lpDf), Seq("n_bigram", "n_prefix"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        expr("(sum(lp) * 100) div count(1)").as("nll_micro"))
      .orderBy(col("doc_id"))
  }

  /** Fitted quantized-LM term table, keyed like the IVF centroid
    * cache; the @volatile copy is what [[sql]] restates as VALUES
    * literals after the query has run (Verify dumps oracle SQL last). */
  private val lpCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), Seq[(Long, Long, Long)]]
  @volatile private var fittedLpPairs
      : Option[Seq[(Long, Long, Long)]] = None

  // Bench evicts fixture memos at query-family boundaries (the
  // @volatile fitted copy survives for oracle restatement)
  graft.FixtureCaches.register(() => lpCache.clear())

  val defs: Map[String, Q] = Map(
    "text_ngram_lm" -> (textNgramLm _),
    "text_perplexity" -> (textPerplexity _),
    "text_chunk" -> (textChunk _),
    "text_stats" -> (textStats _),
    "text_langid" -> (langId _),
    "text_repetition" -> (repetitionQ _),
    "text_fingerprint" -> (fingerprintQ _),
    "text_tfidf" -> (textTfidf _),
    "text_bm25" -> (textBm25 _),
    "text_pii_scrub" -> (piiScrub _),
    "text_bpe_pairs" -> (bpePairs _),
    "text_url_domains" -> (urlDomains _))

  private val statsSql =
    """SELECT doc_id, lang, source,
      | CAST(length(text) AS INT) AS n_chars_txt,
      | CAST(len(string_split(text, ' ')) AS INT) AS n_words,
      | CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT) AS n_tokens,
      | round(CAST(len(list_filter(string_split(text, ' '),
      |   w -> w IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
      |  / CAST(len(string_split(text, ' ')) AS DOUBLE), 6) AS stopword_ratio,
      | round(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE)
      |  / CAST(length(text) AS DOUBLE), 6) AS punct_ratio,
      | round(0.5 * (CAST(len(list_filter(string_split(text, ' '),
      |   w -> w IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
      |  / CAST(len(string_split(text, ' ')) AS DOUBLE))
      |  + 0.3 * least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0)
      |  + 0.2 * (1.0 - CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE)
      |  / CAST(length(text) AS DOUBLE)), 6) AS quality_score
      |FROM documents ORDER BY doc_id""".stripMargin

  private val langIdSql =
    """WITH scored AS (SELECT doc_id, lang,
      | CAST(len(regexp_extract_all(text, 'the ')) + len(regexp_extract_all(text, 'th'))
      |  + len(regexp_extract_all(text, 'er')) + len(regexp_extract_all(text, 'on')) AS INT) AS score_en,
      | CAST(len(regexp_extract_all(text, 'ch')) + len(regexp_extract_all(text, 'ei'))
      |  + len(regexp_extract_all(text, 'der ')) + len(regexp_extract_all(text, 'un')) AS INT) AS score_de,
      | CAST(len(regexp_extract_all(text, 'os')) + len(regexp_extract_all(text, 'ar'))
      |  + len(regexp_extract_all(text, 'el ')) + len(regexp_extract_all(text, 'la ')) AS INT) AS score_es
      |FROM documents)
      |SELECT doc_id, lang, score_en, score_de, score_es,
      | CASE WHEN score_en >= score_de AND score_en >= score_es THEN 'en'
      |      WHEN score_de >= score_es THEN 'de' ELSE 'es' END AS lang_pred
      |FROM scored ORDER BY doc_id""".stripMargin

  private val fpSql =
    """SELECT doc_id,
      | list_reduce(
      |   list_prepend(CAST(7 AS BIGINT),
      |     [CAST(unicode(x) AS BIGINT) for x in string_split(text, '')]),
      |   (a, b) -> (a * 31 + b) % 1000000007) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin

  /** The perplexity oracle restated over the fitted lp literals —
    * available once [[textPerplexity]] ran in this process (Verify
    * dumps oracle SQL after all queries), absent otherwise so a
    * subset run can't emit a stale-constant oracle. DuckDB re-derives
    * the LM counts in SQL and joins the driver-fitted (n_bigram,
    * n_prefix) → lp table exactly as the Spark side does: zero
    * transcendentals run in either engine's compared plan. */
  private def perplexitySql: Option[String] =
    fittedLpPairs.map { pairs =>
      val values = pairs
        .map { case (nb, np, lp) => s"($nb, $np, $lp)" }
        .mkString(",\n  ")
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
         |  WHERE len(string_split(text, ' ')) >= 2),
         |bg AS (SELECT doc_id, w[i] AS w1, w[i+1] AS w2
         |  FROM w, UNNEST(range(1, len(w))) AS t(i)),
         |c AS (SELECT w1, w2, COUNT(*) AS n_bigram FROM bg GROUP BY 1, 2),
         |p AS (SELECT w1, SUM(n_bigram) AS n_prefix FROM c GROUP BY 1),
         |lm AS (SELECT c.w1, c.w2, n_bigram, n_prefix
         |  FROM c JOIN p ON c.w1 = p.w1),
         |lpt(n_bigram, n_prefix, lp) AS (VALUES
         |  $values),
         |terms AS (SELECT bg.doc_id, lpt.lp
         | FROM bg JOIN lm ON bg.w1 = lm.w1 AND bg.w2 = lm.w2
         | JOIN lpt ON lm.n_bigram = lpt.n_bigram
         |         AND lm.n_prefix = lpt.n_prefix)
         |SELECT doc_id, COUNT(*) AS n_bigrams,
         | CAST((SUM(lp) * 100) // COUNT(*) AS BIGINT) AS nll_micro
         |FROM terms GROUP BY doc_id ORDER BY doc_id""".stripMargin
    }

  def sql: Map[String, String] =
    staticSql ++ perplexitySql.map("text_perplexity" -> _)

  private val staticSql: Map[String, String] = Map(
    "text_ngram_lm" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |bg AS (SELECT w[i] AS w1, w[i+1] AS w2
        |  FROM w, UNNEST(range(1, len(w))) AS t(i)),
        |c AS (SELECT w1, w2, COUNT(*) AS n_bigram FROM bg GROUP BY 1, 2),
        |p AS (SELECT w1, SUM(n_bigram) AS n_prefix FROM c GROUP BY 1)
        |SELECT c.w1, c.w2, n_bigram,
        | round(CAST(n_bigram AS DOUBLE) / n_prefix, 6) AS p_cond
        |FROM c JOIN p ON c.w1 = p.w1
        |ORDER BY n_bigram DESC, c.w1, w2 LIMIT 50""".stripMargin,
    "text_chunk" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w
        |  FROM documents WHERE text IS NOT NULL),
        |s AS (SELECT doc_id, w, UNNEST(range(0, greatest(len(w), 1), 40)) AS st
        |  FROM w)
        |SELECT doc_id, CAST(st // 40 AS INT) AS chunk_idx,
        | array_to_string(w[st+1:st+50], ' ') AS chunk_text,
        | CAST(least(50, len(w) - st) AS INT) AS n_words
        |FROM s ORDER BY doc_id, chunk_idx""".stripMargin,
    "text_stats" -> statsSql,
    "text_langid" -> langIdSql,
    "text_repetition" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |g AS (SELECT doc_id,
        |  CAST(len(w) - 2 AS BIGINT) AS n_grams,
        |  CAST(count(DISTINCT w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS BIGINT) AS n_distinct
        | FROM w, UNNEST(range(1, len(w) - 1)) AS t(i)
        | GROUP BY doc_id, len(w))
        |SELECT doc_id, n_grams, n_distinct,
        | round(1.0 - n_distinct / n_grams, 4) AS rep_ratio
        |FROM g ORDER BY doc_id""".stripMargin,
    "text_fingerprint" -> fpSql,
    "text_tfidf" ->
      """WITH t AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS word
        |  FROM documents),
        |tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM t
        |  WHERE word <> '' GROUP BY 1,2),
        |df AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents)
        |SELECT doc_id, word, tf, df,
        | round(tf * ln((n_docs + 1.0)/(df + 1.0)), 6) AS tfidf
        |FROM tf JOIN df USING(word), n
        |ORDER BY tfidf DESC, doc_id, word LIMIT 30""".stripMargin,
    "text_bm25" ->
      """WITH dl AS (SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS dl FROM documents),
        |ad AS (SELECT CAST(SUM(CAST(dl AS DECIMAL(18,4))) AS DOUBLE)/COUNT(*)
        |  AS avgdl FROM dl),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |t AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS word
        |  FROM documents),
        |tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM t
        |  WHERE word IN ('hash','join','scan') GROUP BY 1,2),
        |df AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY 1),
        |s AS (SELECT doc_id, word,
        |  ln(1.0 + (n_docs - df + 0.5)/(df + 0.5)) *
        |  (tf * 2.2)/(tf + 1.2*(1.0 - 0.75 + 0.75*dl/avgdl)) AS sc
        | FROM tf JOIN df USING(word) JOIN dl USING(doc_id), ad, n)
        |SELECT doc_id,
        | round(SUM(CASE WHEN word='hash' THEN sc ELSE 0.0 END)
        |  + SUM(CASE WHEN word='join' THEN sc ELSE 0.0 END)
        |  + SUM(CASE WHEN word='scan' THEN sc ELSE 0.0 END), 6) AS bm25
        |FROM s GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin,
    "text_pii_scrub" ->
      """WITH e AS (SELECT doc_id,
        |  text || ' contact user' || doc_id || '@example.com or 555-' ||
        |  lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS enriched
        | FROM documents)
        |SELECT doc_id,
        | CAST(len(regexp_extract_all(enriched,
        |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT)
        |   AS n_emails,
        | CAST(len(regexp_extract_all(enriched,
        |   '\b\d{3}-\d{4}\b')) AS INT) AS n_phones,
        | CAST(length(enriched) AS INT) AS len_raw,
        | CAST(length(regexp_replace(regexp_replace(enriched,
        |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>',
        |   'g'), '\b\d{3}-\d{4}\b', '<PHONE>', 'g')) AS INT)
        |   AS len_scrubbed
        |FROM e ORDER BY doc_id""".stripMargin,
    "text_url_domains" ->
      """WITH e AS (SELECT doc_id,
        |  'see https://' || source || '.example.org/p/' || doc_id ||
        |  ' and http://cdn.' || source || '.example.net/x ' || text
        |   AS enriched
        | FROM documents),
        |d AS (SELECT doc_id, UNNEST(regexp_extract_all(enriched,
        |  'https?://([A-Za-z0-9.-]+)', 1)) AS domain FROM e)
        |SELECT domain, COUNT(*) AS n_urls,
        | COUNT(DISTINCT doc_id) AS n_docs
        |FROM d GROUP BY domain ORDER BY domain""".stripMargin,
    "text_bpe_pairs" ->
      """WITH w AS (SELECT UNNEST(string_split(text, ' ')) AS w
        |  FROM documents),
        |w2 AS (SELECT w FROM w WHERE length(w) >= 2),
        |p AS (SELECT substring(w, i, 2) AS pair
        |  FROM w2, UNNEST(range(1, length(w))) AS r(i))
        |SELECT pair, COUNT(*) AS n FROM p GROUP BY pair
        |ORDER BY n DESC, pair ASC LIMIT 20""".stripMargin)
}

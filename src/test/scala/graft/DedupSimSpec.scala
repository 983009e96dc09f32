package graft

import graft.queries.{DedupQueries, VectorQueries}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Approximate-operator guarantees that the SQL oracle cannot check:
  * MinHash recall vs exact Jaccard, SimHash finds the near-identical
  * pairs, ANN recall vs brute force, typed Aggregator == declarative
  * centroid. */
class DedupSimSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("minhash LSH candidates recover every exact-Jaccard>=0.5 pair") {
    val exact = DedupQueries.jaccardDedup(spark, TestSession.Sf)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = DedupQueries.minhashDedup(spark, TestSession.Sf)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.9, s"minhash recall $recall; missed ${exact -- lsh}")
    // verification step guarantees no false positives
    assert((lsh -- exact).isEmpty)
  }

  test("sim_cosine_neardup refuses to plan its N-squared join above the guard") {
    // the exactness baseline must not be cargo-culted onto a large
    // corpus: above spark.graft.cosineNearDup.maxRows it fails fast
    // and points at the bucketed ANN queries instead
    val key = "spark.graft.cosineNearDup.maxRows"
    spark.conf.set(key, "10")
    try {
      val e = intercept[IllegalArgumentException] {
        VectorQueries.cosineNearDup(spark, TestSession.Sf)
      }
      assert(e.getMessage.contains("sim_ann_lsh"),
        s"guard must point at the scale path: ${e.getMessage}")
    } finally spark.conf.unset(key)
    // back under the guard the baseline still plans and returns pairs
    assert(VectorQueries.cosineNearDup(spark, TestSession.Sf).count() > 0)
  }

  test("semantic dedup reports only true near-dups of the exact " +
      "baseline, bounded by the cell cut") {
    // brute-force ground truth: all cos>=0.4 pairs (d1 < d2)
    val brute = VectorQueries.cosineNearDup(spark, TestSession.Sf)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val sem = VectorQueries.semanticDedup(spark, TestSession.Sf).collect()
    assert(sem.nonEmpty, "fixture should contain same-cell near-dups")
    sem.foreach { r =>
      val v = r.getAs[Long]("vec_id")
      val kept = r.getAs[Long]("kept_by")
      val maxCos = r.getAs[Double]("max_cos")
      val nDups = r.getAs[Long]("n_dups")
      // the canonical representative must be a genuine near-dup
      assert(brute.contains((kept, v)),
        s"kept_by ($kept,$v) is not a brute-force near-dup")
      // earlier near-dups of v in the full (uncut) pair set
      val earlier = brute.collect { case ((a, b), c) if b == v => (a, c) }
      // the cell cut can only REMOVE candidates, never invent them
      assert(nDups <= earlier.size,
        s"doc $v: $nDups in-cell dups > ${earlier.size} total near-dups")
      assert(maxCos <= earlier.values.max + 1e-9,
        s"doc $v: in-cell max_cos $maxCos exceeds global max")
    }
  }

  test("simhash flags pairs that exact Jaccard also flags") {
    val sim = DedupQueries.simhashDedup(spark, TestSession.Sf)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = DedupQueries.jaccardDedup(spark, TestSession.Sf)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sim.nonEmpty)
    // SimHash is the weakest signal of the three on tiny word-soup docs
    // (64 bits over ≤ 31-word vocabularies collide easily) — require
    // "mostly right", not parity with exact Jaccard.
    val precision = (sim & exact).size.toDouble / sim.size
    assert(precision >= 0.7, s"simhash precision $precision vs exact")
  }

  test("ANN results are true neighbors within their bucket (subset of "
      + "brute-force ranking by construction)") {
    val ann = VectorQueries.annLsh(spark, TestSession.Sf)
    val brute = VectorQueries.topK(spark, TestSession.Sf)
    // Every (qid,tid) ANN returns must score identically under the
    // brute-force cosine (same scoring function).
    val annPairs = ann.select("qid", "tid", "cos").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val brutePairs = brute.select("qid", "tid", "cos").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val overlap = annPairs.keySet & brutePairs.keySet
    overlap.foreach { k => assert(annPairs(k) == brutePairs(k)) }
    assert(ann.count() > 0)
  }

  test("IVF ANN returns true in-cell neighbors with brute-force-identical scores") {
    val ivf = VectorQueries.annIvf(spark, TestSession.Sf)
    val brute = VectorQueries.topK(spark, TestSession.Sf)
    val ivfPairs = ivf.select("qid", "tid", "cos").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val brutePairs = brute.select("qid", "tid", "cos").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(ivfPairs.nonEmpty)
    (ivfPairs.keySet & brutePairs.keySet).foreach { k =>
      assert(ivfPairs(k) == brutePairs(k))
    }
  }

  test("codegen'd graft_dot equals the built-in zip_with/aggregate fold") {
    graft.functions.DotProduct.register(spark)
    val diffs = Tables.embeddings(spark, TestSession.Sf).as("a")
      .crossJoin(Tables.embeddings(spark, TestSession.Sf)
        .limit(3).select(col("embedding").as("probe")))
      .select(
        expr("graft_dot(embedding, probe)").as("fast"),
        graft.functions.VectorFunctions.dotD(col("embedding"), col("probe"))
          .as("composed"))
      .filter(col("fast") =!= col("composed"))
      .count()
    assert(diffs == 0, "graft_dot must be bit-identical to the composition")
  }

  test("typed VectorMeanAgg equals the declarative centroid query") {
    import spark.implicits._
    val agg = Tables.embeddings(spark, TestSession.Sf)
      .select(col("label"), col("embedding"))
      .as[(Int, Seq[Float])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(graft.functions.VectorMeanAgg.toColumn.name("centroid"))
      .collect().toMap
    val declared = VectorQueries.centroids(spark, TestSession.Sf)
      .collect()
      .groupBy(_.getInt(0))
      .map { case (label, rows) =>
        label -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
      }
    assert(agg.keySet == declared.keySet)
    // declared means are round(·,6); aggregator means are raw doubles
    // with a different (single-pass) summation order — compare within
    // the rounding granularity.
    for ((label, vec) <- declared; (g, v) <- agg(label).zip(vec)) {
      assert(math.abs(g - v) < 6e-7, s"label $label: $g vs $v")
    }
  }

  test("persisted IVF index answers exactly like the in-memory IVF probe") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val mem = rows(VectorQueries.annIvf(spark, TestSession.Sf))
    val idx = rows(VectorQueries.annIvfIndexed(spark, TestSession.Sf))
    assert(idx == mem,
      s"index layout changed answers: only-mem=${mem -- idx} only-idx=${idx -- mem}")
    // and probing is a partition-filtered scan: the probed-cell filter
    // prunes whole cell directories at planning time
    val index = graft.Scratch.dir("ivf_index", TestSession.Sf)
    val full = spark.read.format("arrow").load(index)
    val probedOne = full.filter(org.apache.spark.sql.functions.col("cell") === 0)
    assert(probedOne.rdd.getNumPartitions < full.rdd.getNumPartitions,
      "cell filter pruned no index files")
  }

  test("incrementally maintained IVF index: the batch append touches " +
      "no existing file and probing answers exactly like full IVF") {
    import org.apache.spark.sql.functions.col
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val mem = rows(VectorQueries.annIvf(spark, TestSession.Sf))
    // first call builds base + appends the batch (Fixtures.once)
    val incr = rows(VectorQueries.annIvfIncremental(spark, TestSession.Sf))
    assert(incr == mem,
      s"incremental index diverged: only-mem=${mem -- incr} " +
        s"only-incr=${incr -- mem}")
    // the maintained index holds every vector exactly once, and its
    // file set splits into base + appended batch (append created new
    // files inside existing cell dirs rather than rewriting them)
    val index = graft.Scratch.dir("ivf_incr_index", TestSession.Sf)
    val idx = spark.read.format("arrow").load(index)
    val n = Tables.embeddings(spark, TestSession.Sf).count()
    assert(idx.count() == n, "maintained index lost or duplicated rows")
    assert(idx.select(col("vec_id")).distinct().count() == n)
  }

  test("DV DELETE on the IVF index rewrites no cell file and masks " +
      "exactly the retired slice") {
    import org.apache.spark.sql.functions.col
    val index = graft.Scratch.dir("ivf_del_index", TestSession.Sf)
    val first = VectorQueries.annIvfDelete(spark, TestSession.Sf).collect()
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val files = walk(new java.io.File(index))
    val dataFiles = files.filter(_.getName.endsWith(".arrow"))
    val dvFiles = files.filter(_.getName.endsWith(".dv"))
    // merge-on-read: the DELETE produced DV sidecars, and every cell
    // data file predates them — a copy-on-write DELETE would have
    // written replacement .arrow files AFTER the delete
    assert(dvFiles.nonEmpty, "no deletion-vector sidecars under the index")
    val earliestDv = dvFiles.map(_.lastModified()).min
    assert(dataFiles.nonEmpty &&
      dataFiles.forall(_.lastModified() <= earliestDv),
      "a cell data file was rewritten after the DV delete")
    // the DELETE masked exactly vec_id % 7 == 3
    val live = spark.read.format("arrow").load(index)
    assert(live.filter(col("vec_id") % 7 === 3).count() == 0)
    val total = Tables.embeddings(spark, TestSession.Sf).count()
    val retired = Tables.embeddings(spark, TestSession.Sf)
      .filter(col("vec_id") % 7 === 3).count()
    assert(retired > 0 && live.count() == total - retired)
    // idempotent probe: a second invocation is probe-only (Fixtures.once)
    // and answers identically
    val again = VectorQueries.annIvfDelete(spark, TestSession.Sf).collect()
    assert(again.toSeq == first.toSeq)
  }

  test("multi-probe LSH recall is at least single-probe recall") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(VectorQueries.topK(spark, TestSession.Sf))
    val single = pairs(VectorQueries.annLsh(spark, TestSession.Sf))
    val multi = pairs(VectorQueries.annLshMultiprobe(spark, TestSession.Sf))
    assert(brute.nonEmpty)
    val rSingle = (single intersect brute).size.toDouble / brute.size
    val rMulti = (multi intersect brute).size.toDouble / brute.size
    assert(rMulti >= rSingle,
      s"multi-probe recall $rMulti < single-probe $rSingle")
    assert(multi.size >= single.size)
  }

  test("incremental substring dedup equals the full pipeline " +
      "restricted to the ingest batch") {
    val full = DedupQueries.substringDedup(spark, TestSession.Sf)
    val inc = DedupQueries.substringDedupIncremental(spark, TestSession.Sf)
    val maxId = Tables.documents(spark, TestSession.Sf)
      .agg(max(col("doc_id"))).collect()(0).getLong(0)
    val cut = maxId * 9L / 10L
    val expected = full.filter(col("doc_id") >= cut)
    assert(inc.exceptAll(expected).isEmpty &&
      expected.exceptAll(inc).isEmpty,
      "incremental substring dedup diverges from the batch pipeline")
    assert(inc.count() > 0, "ingest batch unexpectedly empty")
  }

  test("df-bounded dedup: fan-out capped, output contained, no-op at max df") {
    import org.apache.spark.sql.functions.{col, count, lit}
    val sf = TestSession.Sf
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("d1", "d2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairSet(DedupQueries.jaccardDedup(spark, sf))
    assert(exact.nonEmpty)

    // the fixture's df distribution: pick a cut that actually bites
    val dfs = graft.functions.ShingleGenExpr(
      Tables.documents(spark, sf)
        .select(col("doc_id"),
          graft.functions.TextFunctions.words(col("text")).as("w")),
      col("w"), 3)
      .select(col("doc_id"), col("shingle")).distinct()
      .groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .select(col("df")).collect().map(_.getLong(0))
    val maxDf = dfs.max
    assert(maxDf >= 2, "fixture has no shared shingles to cut")

    // a biting cut: some shingles dropped, bound holds, output contained
    val cut = maxDf - 1
    val bounded = pairSet(
      DedupQueries.jaccardPairsDfBounded(spark, sf, cut))
    assert(bounded.subsetOf(exact),
      s"df cut invented pairs: ${bounded -- exact}")
    // verification is exact, so recall only drops for pairs whose
    // EVERY common shingle is hot — rare even at an aggressive cut
    val recall = (bounded & exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"df-bounded recall $recall at dfMax=$cut")

    // dfMax >= max df cuts nothing: bit-identical to the exact path
    val noop = pairSet(
      DedupQueries.jaccardPairsDfBounded(spark, sf, maxDf))
    assert(noop == exact)
  }

  test("multi-probe IVF recall is at least single-cell recall, at bounded cost") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(VectorQueries.topK(spark, TestSession.Sf))
    val single = pairs(VectorQueries.annIvf(spark, TestSession.Sf))
    val multi = pairs(VectorQueries.annIvfMultiprobe(spark, TestSession.Sf))
    assert(brute.nonEmpty && single.nonEmpty)
    val rSingle = (single intersect brute).size.toDouble / brute.size
    val rMulti = (multi intersect brute).size.toDouble / brute.size
    assert(rMulti >= rSingle,
      s"multi-probe IVF recall $rMulti < single-cell $rSingle")
    // multi-probe scores a candidate superset (the nearest cell is one
    // of the 3 probed), so it answers at least as many queries...
    assert(multi.size >= single.size)
    // ...while the output budget stays k per query regardless of
    // nprobe — the extra probes widen the candidate pool (bounded by
    // nprobe × largest cell), not the result
    assert(multi.groupBy(_._1).values.forall(_.size <= 5))
  }

  test("PQ-ADC ranking preserves similarity signal at 32x compression") {
    val brute = VectorQueries.topK(spark, TestSession.Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val pq = VectorQueries.pqAdc(spark, TestSession.Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // shape contract: exactly 5 per query, deterministic re-run
    assert(pq.groupBy(_._1).values.forall(_.size == 5))
    val again = VectorQueries.pqAdc(spark, TestSession.Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pq.sameElements(again), "PQ ranking is nondeterministic")
    // signal preservation: 8 code bytes stand in for 256 float bytes;
    // on the near-random fixture absolute top-5 recall is necessarily
    // modest (most cosines tie near 0, so any quantization scrambles
    // the tail), but PQ must still recover a clearly-better-than-
    // chance slice of the exact top-5 (chance ≈ 5/500 = 1%)
    val bruteSet = brute.map { case (q, t, _) => (q, t) }.toSet
    val recall = pq.count(bruteSet.contains).toDouble / brute.length
    assert(recall >= 0.1, s"PQ top-5 recall $recall < 0.1 floor")
  }

  test("IVF-PQ composes its parents' budgets: candidates confined to " +
      "the probed cells, PQ-class recall at the bounded budget") {
    def pairs(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1)))
    val brute = pairs(VectorQueries.topK(spark, TestSession.Sf).collect())
    val ivfpq = pairs(VectorQueries.annIvfPq(spark, TestSession.Sf)
      .collect())
    // shape + determinism, the pqAdc contract
    assert(ivfpq.groupBy(_._1).values.forall(_.size <= 5))
    val again = pairs(VectorQueries.annIvfPq(spark, TestSession.Sf)
      .collect())
    assert(ivfpq.sameElements(again), "IVF-PQ ranking is nondeterministic")
    // recall floor: the composition ranks by 8-byte ADC inside ~3/16
    // of the corpus, so it cannot beat pqAdc, but on the fixture it
    // must keep the clearly-better-than-chance slice (chance ≈ 1%)
    val bruteSet = brute.toSet
    val recall = ivfpq.count(bruteSet.contains).toDouble / brute.length
    assert(recall >= 0.08, s"IVF-PQ top-5 recall $recall < 0.08 floor")
    // budget sanity vs the exact-ranked multiprobe over the SAME fit:
    // both pipelines draw candidates from the same probed cells, so
    // they must agree on a healthy slice of their top-5s (fixed
    // fixture + deterministic fits → this overlap is deterministic)
    val ivfMulti = pairs(VectorQueries
      .annIvfMultiprobe(spark, TestSession.Sf).collect()).toSet
    val agree = ivfpq.count(ivfMulti.contains).toDouble / ivfpq.length
    assert(agree >= 0.2,
      s"IVF-PQ shares only $agree of its picks with exact-ranked " +
        "multiprobe over the same cells — candidate pool likely wrong")
  }

  test("typed SimHashAgg signatures are bit-equal to the 64-sum formulation") {
    val viaAgg = DedupQueries.simhashDedup(spark, TestSession.Sf) // warms path
    viaAgg.collect() // force; result shape irrelevant here
    val a = {
      val spark2 = spark
      import org.apache.spark.sql.functions._
      spark2.udf.register("graft_simhash",
        udaf(graft.functions.SimHashAgg))
      Tables.documents(spark2, TestSession.Sf)
        .select(col("doc_id"),
          explode(graft.functions.TextFunctions.words(col("text")))
            .as("word"))
        .withColumn("h", graft.functions.TextFunctions.hash64(col("word")))
        .groupBy(col("doc_id"))
        .agg(expr("graft_simhash(h)").as("simhash"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val b = DedupQueries.simhashViaSums(spark, TestSession.Sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, "Aggregator and 64-sum signatures diverge")
    assert(a.nonEmpty)
  }

  test("incremental dedup over the persisted index equals the batch " +
      "LSH pair set restricted to pairs touching the ingest batch") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.01"
    val maxId = Tables.documents(spark, sf)
      .agg(max(col("doc_id"))).collect()(0).getLong(0)
    val cut = maxId * 9L / 10L
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select(col("d1"), col("d2")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = pairs(DedupQueries.minhashDedup(spark, sf)
      .filter(col("d2") >= cut))
    val incr = pairs(DedupQueries.incrementalDedup(spark, sf))
    // same banding, same verification, candidate cut = d2 in batch:
    // probing the PERSISTED index must lose and invent nothing
    assert(incr == batch,
      s"incremental diverged: missing ${batch -- incr}, " +
        s"extra ${incr -- batch}")
    assert(incr.nonEmpty, "fixture has no pairs touching the batch")
    assert(incr.forall { case (_, d2) => d2 >= cut },
      "a pair with no batch member leaked into the incremental output")
  }

  test("MMR re-ranking diversifies: the selection deviates from pure " +
      "relevance order, every pick is a true top-8 candidate, and the " +
      "greedy is deterministic across invocations") {
    import org.apache.spark.sql.functions._
    val mmr = VectorQueries.mmrRerank(spark, TestSession.Sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(mmr.length == 4 && mmr.map(_._1).toSeq == Seq(1, 2, 3, 4))
    // rebuild the pure top-8 relevance ranking with the same scoring
    // the query uses (round-6 cosine to vec 0, ties on id)
    graft.functions.DotProduct.register(spark)
    val e = Tables.embeddings(spark, TestSession.Sf)
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"))
    val top8 = e.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(expr("graft_dot(qv, embedding)") /
          sqrt(expr("graft_dot(embedding, embedding)") *
            expr("graft_dot(qv, qv)")), 6).as("rel"))
      .orderBy(col("rel").desc, col("vec_id").asc).limit(8)
      .collect().map(_.getLong(0)).toSeq
    // EVERY pick is a true top-8 candidate
    assert(mmr.map(_._2).toSet.subsetOf(top8.toSet),
      s"MMR picked outside the candidate set: ${mmr.toSeq} vs $top8")
    // rank 1 IS the relevance argmax
    assert(mmr.head._2 == top8.head, "MMR must seed with the top hit")
    // and the tail deviates from pure relevance order somewhere —
    // diversity actually re-ranked on this fixture (a fixture change
    // that kills the property should fail here, not silently pass)
    val byRel = mmr.sortBy { case (_, tid, rel) => (-rel, tid) }
      .map(_._2).toSeq
    assert(mmr.map(_._2).toSeq != byRel,
      "MMR output equals pure relevance order — diversification never fired")
    val again = VectorQueries.mmrRerank(spark, TestSession.Sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(again.toSeq == mmr.toSeq, "greedy selection must be stable")
  }
}

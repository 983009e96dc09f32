package graft.tools

import org.apache.spark.sql.functions._

import graft.{Engine, SparkEntry, Tables}

/** Focused scale-up bench: the heavyweight operators whose 100 TB
  * story rests on O(churned bytes) / O(metadata) claims are measured
  * at ~sf1 (10× the per-round bench's sf0.1), built by key-shifted
  * replication of the sf0.1 fixtures into a temp dir. Emits one JSON
  * line per measurement; numbers are recorded in BASELINE.md.
  *
  * What each point is evidence FOR:
  *  - `cdc_replicate` / `cdc_incremental_agg`: the DML predicates hit
  *    a FIXED key range, so churn is constant while the table grows
  *    10× — if refresh cost were O(table) these would scale ~10×; the
  *    O(churn) claim predicts the maintain phase stays flat and only
  *    the fixture snapshot write (an explicit O(table) step) grows.
  *  - `dedup_minhash`: per-copy tag words keep near-dup structure ~10×
  *    (verbatim copies would square the bucket pairs instead).
  *  - footer-index: a selective filtered count over a many-file Arrow
  *    table, with the sidecar present vs deleted (per-file footer
  *    opens) — the planning-path O(1)-metadata claim, measured.
  */
object BenchFocus {
  private val Copies = 10

  def main(args: Array[String]): Unit = {
    val sfDir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark =
      Engine.sessionBuilder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val scaled = graft.Scratch.dir("sf1_scaled", sfDir)
    val root = new java.io.File(scaled)
    if (!new java.io.File(root, "orders.parquet").exists()) {
      root.mkdirs()
      // orders: shift keys by 1e9 per copy (never collides with the
      // IVM fixture's +2e7 synthetic inserts)
      val o = Tables.orders(spark, sfDir)
      // customers shift per copy too (custkey max at sf0.1 is 15k):
      // pagerank's NODE set must grow with the copies, else the
      // edge-level distinct() collapses the 10 copies back to the
      // sf0.1 graph and the "10× edges" point measures nothing
      (0 until Copies).map(i =>
          o.withColumn("o_orderkey",
            col("o_orderkey") + lit(i.toLong * 1000000000L))
            .withColumn("o_custkey",
              col("o_custkey") + lit(i.toLong * 200000L)))
        .reduce(_ unionAll _)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$scaled/orders.parquet")
      // documents: shifted ids + a per-copy tag word appended so the
      // near-dup structure scales ~linearly, not quadratically
      val d = Tables.documents(spark, sfDir)
      (0 until Copies).map(i =>
          d.withColumn("doc_id",
            col("doc_id") + lit(i.toLong * 10000000L))
            .withColumn("text",
              concat(col("text"), lit(s" copytag$i"))))
        .reduce(_ unionAll _)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$scaled/documents.parquet")
    }

    // lineitem: shifted orderkeys matching the orders shift, so the
    // customer↔supplier edge set (graph_pagerank) grows ~10× — a
    // fixed-iteration rank pass should scale ~linearly with edges.
    // Guarded independently of the orders/documents block: the scaled
    // dir may predate this table.
    if (!new java.io.File(root, "lineitem.parquet").exists()) {
      root.mkdirs()
      val li = Tables.lineitem(spark, sfDir)
      // suppliers shift per copy (suppkey max at sf0.1 is 1k), same
      // reason as the o_custkey shift above
      (0 until Copies).map(i =>
          li.withColumn("l_orderkey",
            col("l_orderkey") + lit(i.toLong * 1000000000L))
            .withColumn("l_suppkey",
              col("l_suppkey") + lit(i * 10000)))
        .reduce(_ unionAll _)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$scaled/lineitem.parquet")
    }

    // part: shifted keys AND shifted prices per copy, so the skyline's
    // per-price aggregate sees 10× distinct prices (identical copies
    // would collapse in the groupBy and the 10× point would measure
    // nothing)
    if (!new java.io.File(root, "part.parquet").exists()) {
      root.mkdirs()
      val pt = Tables.part(spark, sfDir)
      (0 until Copies).map(i =>
          pt.withColumn("p_partkey",
            col("p_partkey") + lit(i.toLong * 100000000L))
            .withColumn("p_retailprice",
              col("p_retailprice") + lit(i * 5000.0)))
        .reduce(_ unionAll _)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$scaled/part.parquet")
    }

    // events: shifted user/event ids per copy — per-user window
    // partitions keep their sf0.1 size while users and rows grow 10×
    // (events_markov's lag windows + alphabet-sized matrix)
    if (!new java.io.File(root, "events.parquet").exists()) {
      root.mkdirs()
      val ev = Tables.events(spark, sfDir)
      (0 until Copies).map(i =>
          ev.withColumn("event_id",
            col("event_id") + lit(i.toLong * 1000000000L))
            .withColumn("user_id",
              col("user_id") + lit(i.toLong * 10000000L)))
        .reduce(_ unionAll _)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$scaled/events.parquet")
    }
    // customer: shifted custkeys matching the orders shift, so the
    // mutable-dim join view's fact→dim references stay valid while
    // BOTH sides grow 10× (modular churn predicates then touch every
    // copy — dim churn grows with the dim, the O(churn) claim's
    // denominator)
    if (!new java.io.File(root, "customer.parquet").exists()) {
      root.mkdirs()
      val cu = Tables.customer(spark, sfDir)
      (0 until Copies).map(i =>
          cu.withColumn("c_custkey",
            col("c_custkey") + lit(i.toLong * 200000L)))
        .reduce(_ unionAll _)
        .repartition(8)
        .write.mode("overwrite").parquet(s"$scaled/customer.parquet")
    }

    // embeddings: shifted vec_ids — the corpus grows 10× while copy-0
    // ids keep the sub-1e7 range, so a FIXED probe/query set exists
    // at both scales (sim_ann_ivfpq's vec_id < 20 queries, the
    // fixed-probe decontam point below)
    if (!new java.io.File(root, "embeddings.parquet").exists()) {
      root.mkdirs()
      val em = Tables.embeddings(spark, sfDir)
      (0 until Copies).map(i =>
          em.withColumn("vec_id",
            col("vec_id") + lit(i.toLong * 10000000L)))
        .reduce(_ unionAll _)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$scaled/embeddings.parquet")
    }

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def bench(name: String, dir: String): (Double, Double) = {
      val fn = SparkEntry.queries(name)
      def once() = fn(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (time(once()), time(once()))
    }

    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // join_set_similarity is deliberately ABSENT: the scaled corpus's
    // per-copy tag word leaves cross-copy pairs ~0.98-similar, so the
    // TRUE qualifying pair set grows quadratically with copies — a
    // data property, not an operator cost; its pruning claim is the
    // SetSimilaritySpec equality + the sf0.1 bench point.
    // join_temporal_scd2 / merge_full_sync: the cdc/merge predicates
    // hit FIXED key ranges (copy 0 only), so churn stays constant
    // while the table grows 10× — the O(churn) maintenance claim.
    // agg_bitmap_distinct: per-copy custkey shifts grow the distinct
    // set 10×; the bitmap partials stay mergeable per (month, bucket).
    // agg_sketch_intersection / agg_quantile_sketch: per-copy custkey
    // and orderkey shifts grow both sides' distinct sets 10×; the
    // bounded-heap level-1 partials (TopKPerGroupExec) keep every
    // (group, month) cut map-side — the r15 before/after point for
    // the removed row_number() window.
    // events_markov: 10× users/rows, same |types|² matrix.
    // arrow_merge_schema_write/_nested, merge_upsert_evolve: the
    // snapshot write is explicit O(table); the evolution itself is
    // metadata + O(appended/matched batch) — same framing as cdc_*.
    // sim_ann_ivfpq: fits re-run at 10× corpus (one-time per dir);
    // the probe/rank phase is bounded by nprobe × cell size.
    // arrow_type_widen / arrow_default_column: the snapshot write is
    // explicit O(table); the widen/default declaration is one
    // metadata CAS and the reader's per-file upcast/constant-fill is
    // O(1) per batch — same framing as the schema-merge points.
    // dedup_substring: the replicated copies make nearly EVERY window
    // a true cross-copy duplicate (worst case for the confirm phase),
    // yet cost stays O(total windows) end to end — hash phase keyed
    // by longs, confirm re-extracts each instance once, no pairwise
    // blowup.
    // sample_priority: 10× corpus, same k per language — the
    // bounded-heap partials keep every group cut map-side, so the
    // point should track the SCAN, not a per-language sort.
    // media_phash_dedup: 10× media rows; banding keeps candidates
    // bucketed, never all-pairs, so the point tracks the scan+digest.
    // join_asof_nearest: 10× events over 10× users — per-user window
    // partitions keep their size; ONE user_id exchange either way.
    // graph_sssp_bounded: 10× edges, same 3 bounded hops — frontier
    // joins with anti-join known-set should track edges ~linearly.
    // sim_mmr_rerank: candidates bounded by k (not corpus), so the
    // point should track the coarse retrieval scan only.
    // stream_sessions_dynamic: 10× events through the same
    // session-window transform; state is per-user, bounded.
    // dedup_substring_incremental: the batch is the last ~10% of ids
    // (one full copy at 10×) and the replicated copies make ~every
    // batch window collide with the index — the DEGENERATE case where
    // batch×index covers the whole index, so the confirm volume (and
    // the index-scan overhead) matches the full pipeline's rather than
    // undercutting it. The claim this point supports is the GENERATION
    // saving (windows derive from batch text only; the index is read,
    // never regenerated) and O(batch + collisions) cost — which at
    // realistic collision rates is the whole win, and at ~100%
    // collisions honestly degenerates to full-confirm cost.
    for (q <- Seq("cdc_replicate", "cdc_incremental_agg", "cdc_scd2",
        "arrow_wap_publish", "dedup_minhash", "graph_pagerank",
        "skyline_pareto", "agg_quantile_sketch",
        "agg_sketch_intersection", "events_markov",
        "arrow_merge_schema_write", "arrow_merge_schema_nested",
        "merge_upsert_evolve", "sim_ann_ivfpq",
        "join_temporal_scd2", "merge_full_sync", "agg_bitmap_distinct",
        "layout_compaction", "arrow_type_widen", "arrow_default_column",
        "dedup_substring", "sample_priority",
        "media_phash_dedup", "join_asof_nearest", "graph_sssp_bounded",
        "sim_mmr_rerank", "stream_sessions_dynamic",
        "dedup_substring_incremental",
        // cdc_incremental_join_mutable: both snapshot writes and the
        // initial view build are explicit O(table); the two delta
        // refreshes are O(churn) — fact churn (fixed <300 range on
        // copy 0 + modular %401 inserts) and dim churn (modular %7
        // update / %97 delete across every copy) both scale with
        // their tables. The 10× point also flips the F_old⋈ΔD arm:
        // at sf0.1 the ~2.4k churned dim keys fold into the pushed IN
        // filter, at 10× the ~24k keys exceed the bound and the term
        // honestly falls back to the distributed join
        "cdc_incremental_join_mutable",
        // sample_cluster_balanced: 10× corpus through the same IVF
        // assignment pass; the rate table stays |cells| rows and the
        // kept set never shuffles — should track the assignment scan
        "sample_cluster_balanced",
        // sim_hard_negatives: fixed 16-query broadcast over a 10×
        // corpus — scoring tracks the scan; the positives anti-join
        // side (16/211 of the corpus) grows 10× but is explicitly
        // broadcast, so the scored relation never shuffles
        "sim_hard_negatives")) {
      val (s1a, s1b) = bench(q, sfDir)
      val (s10a, s10b) = bench(q, scaled)
      out(q) = f"""{"sf0.1":${math.min(s1a, s1b)}%.2f,""" +
        f""""sf1":${math.min(s10a, s10b)}%.2f}"""
    }

    // footer-index planning claim: full metadata pass (load index +
    // stats for every file) over a 512-file Arrow table, sidecar
    // present vs deleted. Footer parses are memoized IN-PROCESS
    // (ArrowScan), so an honest comparison needs a FRESH JVM per
    // measurement — each child runs graft.tools.FooterProbe cold.
    val arrowDir = graft.Scratch.dir("sf1_arrow", sfDir)
    if (!new java.io.File(arrowDir).exists()) {
      spark.read.parquet(s"$scaled/orders.parquet")
        .repartition(512)
        .write.format("arrow").mode("overwrite").save(arrowDir)
    }
    // tiny sibling dir used only to warm classloading inside the probe
    val warmDir = graft.Scratch.dir("sf1_arrow_warm", sfDir)
    if (!new java.io.File(warmDir).exists()) {
      spark.read.parquet(s"$scaled/orders.parquet").limit(100)
        .coalesce(1)
        .write.format("arrow").mode("overwrite").save(warmDir)
    }
    def probe(): Double = {
      val javaBin = java.nio.file.Paths
        .get(System.getProperty("java.home"), "bin", "java").toString
      val p = new ProcessBuilder(javaBin, "-cp",
        System.getProperty("java.class.path"),
        "graft.sources.arrow.FooterProbe", warmDir, arrowDir)
        .redirectErrorStream(true).start()
      val outTxt = new String(p.getInputStream.readAllBytes, "UTF-8")
      require(p.waitFor() == 0, s"FooterProbe failed: $outTxt")
      outTxt.linesIterator.collectFirst {
        case l if l.startsWith("FOOTER_PROBE_SEC=") =>
          l.stripPrefix("FOOTER_PROBE_SEC=").toDouble
      }.get
    }
    // TOP-N pushdown claim: ORDER BY k LIMIT 10 over a SORTED ~sf1
    // arrow layout (batch-sliver scan) vs the same data+layout in
    // parquet (no top-n pushdown: full scan into TakeOrdered)
    val sortedArrow = graft.Scratch.dir("sf1_arrow_sorted", sfDir)
    val sortedParquet = graft.Scratch.dir("sf1_parquet_sorted", sfDir)
    if (!new java.io.File(sortedArrow).exists()) {
      val base = spark.read.parquet(s"$scaled/orders.parquet")
        .repartitionByRange(32, col("o_orderkey"))
        .sortWithinPartitions(col("o_orderkey"))
      base.write.format("arrow").option("sortBy", "o_orderkey")
        .mode("overwrite").save(sortedArrow)
      base.write.mode("overwrite").parquet(sortedParquet)
    }
    def topn(df: org.apache.spark.sql.DataFrame): Double = time {
      df.orderBy(col("o_orderkey")).limit(10)
        .write.format("noop").mode("overwrite").save()
    }
    val arrowDf = spark.read.format("arrow").load(sortedArrow)
    val parquetDf = spark.read.parquet(sortedParquet)
    val (aw1, aw2) = (topn(arrowDf), topn(arrowDf))
    val (pw1, pw2) = (topn(parquetDf), topn(parquetDf))
    out("topn_sorted_sf1") =
      f"""{"arrow_pushed":${math.min(aw1, aw2)}%.3f,""" +
        f""""parquet_full":${math.min(pw1, pw2)}%.3f}"""

    // sim_decontam_semantic with the probe set FIXED to copy 0
    // (vec_id < 1e7): the real deployment shape — a fixed eval set
    // against a growing corpus — must scale ~linearly with the
    // corpus. (The DECLARED query's % 97 probe slice grows with the
    // fixture by construction — documented there — so measuring it at
    // 10× would conflate probe growth with corpus growth.)
    def decontamFixed(dir: String): Double = {
      graft.functions.DotProduct.register(spark)
      def once() = {
        val e = Tables.embeddings(spark, dir)
        val probes = e.filter(col("vec_id") < 10000000L &&
            col("vec_id") % 97 === 0)
          .select(col("vec_id").as("pid"), col("embedding").as("pv"),
            expr("graft_dot(embedding, embedding)").as("p_nsq"))
        val corpus = e.select(col("vec_id"), col("embedding"),
          expr("graft_dot(embedding, embedding)").as("nsq"))
        corpus.join(broadcast(probes), col("vec_id") =!= col("pid"))
          .select(col("vec_id"),
            (expr("graft_dot(embedding, pv)") /
              sqrt(col("nsq") * col("p_nsq"))).as("cos"))
          .filter(col("cos") >= 0.4)
          .groupBy(col("vec_id"))
          .agg(count(lit(1)).as("hits"))
          .write.format("noop").mode("overwrite").save()
      }
      val a = time(once()); val b = time(once()); math.min(a, b)
    }
    out("sim_decontam_fixedprobes") =
      f"""{"sf0.1":${decontamFixed(sfDir)}%.2f,""" +
        f""""sf1":${decontamFixed(scaled)}%.2f}"""

    val withIdx = probe()
    val sidecar = java.nio.file.Paths.get(arrowDir)
      .resolve(graft.sources.arrow.FooterIndexFile.FileName)
    val saved = java.nio.file.Files.readAllBytes(sidecar)
    java.nio.file.Files.delete(sidecar)
    val noIdx = probe()
    java.nio.file.Files.write(sidecar, saved)
    out("footer_metadata_pass_512files") =
      f"""{"with_sidecar":$withIdx%.3f,"per_file_footers":$noIdx%.3f}"""

    spark.stop()
    println(out.map { case (k, v) => s""""$k":$v""" }
      .mkString("""{"metric":"focus_sf1",""", ",", "}"))
  }
}

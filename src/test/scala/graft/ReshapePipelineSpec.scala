package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the reshape + pipeline operator families
  * (ReshapeQueries / PipelineQueries); exact-value parity is the DuckDB
  * oracle's job. Runs on sf0.01 where the dedup fixtures actually
  * contain near-duplicate clusters. */
class ReshapePipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val Sf01 = "/root/testdata/sf0.01"

  test("pivot_wide is one row per status with all five priority columns") {
    val df = queries.ReshapeQueries.pivotWide(spark, TestSession.Sf)
    assert(df.columns.toSeq ==
      Seq("o_orderstatus", "p_urgent", "p_high", "p_medium", "p_notspec",
        "p_low"))
    val rows = df.collect()
    assert(rows.map(_.getString(0)).distinct.length == rows.length)
  }

  test("unpivot_long emits exactly two rows per part") {
    val nParts = Tables.part(spark, TestSession.Sf)
      .filter(col("p_partkey") <= 2000).count()
    val df = queries.ReshapeQueries.unpivotLong(spark, TestSession.Sf)
    assert(df.count() == 2 * nParts)
    assert(df.select("metric").distinct().collect().map(_.getString(0))
      .sorted.toSeq == Seq("p_retailprice", "p_size"))
  }

  test("sample_hash is deterministic and samples roughly 5%") {
    val a = queries.ReshapeQueries.sampleHash(spark, Sf01).collect()
    val b = queries.ReshapeQueries.sampleHash(spark, Sf01).collect()
    assert(a.toSeq == b.toSeq)
    val total = Tables.orders(spark, Sf01).count()
    val sampled = a.map(_.getLong(1)).sum
    assert(sampled > total / 40 && sampled < total / 10,
      s"sampled $sampled of $total")
  }

  test("sample_hash / sample_stratified survive order keys beyond 2^32 " +
      "(fold-first multiplicative hash, no silent wrap)") {
    // the unfolded key·2654435761 form wraps Spark's non-ANSI multiply
    // for keys ≥ ~3.5e9 while DuckDB raises out-of-range — the folded
    // idiom (key % 2³¹ first) must agree with exact BigInt arithmetic
    // on a synthetic orders table whose keys start at 2³³ (the same
    // id regime BenchFocus's 10× fixtures produce via i·1e9 shifts)
    val dir = Scratch.dir("hash64_orders", "hash64o")
    val base = 8589934592L // 2^33
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM")
    val rows = (0 until 400).map { i =>
      (base + i.toLong * 1000000007L,
        if (i % 3 == 0) "O" else "F", prios(i % 3),
        100.0 + (i % 50), java.sql.Date.valueOf("2024-01-01"))
    }
    spark.createDataFrame(rows)
      .toDF("o_orderkey", "o_orderstatus", "o_orderpriority",
        "o_totalprice", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    def h(k: Long): Long =
      ((BigInt(k) mod BigInt(2147483648L)) * BigInt(2654435761L) mod
        BigInt(4294967296L)).toLong
    val expHash = rows.filter(r => h(r._1) % 20 == 0)
      .groupBy(_._2).view
      .mapValues(rs => (rs.size.toLong,
        rs.map(r => BigDecimal(r._4).setScale(2)).sum.toDouble)).toMap
    val gotHash = queries.ReshapeQueries.sampleHash(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(gotHash == expHash,
      s"folded sample_hash diverged from exact arithmetic:\n" +
        s"spark=$gotHash\nexact=$expHash")
    val expStrat = rows.filter { r =>
      val hh = h(r._1) % 100
      if (r._3 == "1-URGENT") hh < 20 else hh < 2
    }.groupBy(_._3).view
      .mapValues(rs => (rs.size.toLong,
        rs.map(r => BigDecimal(r._4).setScale(2)).sum.toDouble)).toMap
    val gotStrat = queries.ReshapeQueries.sampleStratified(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(gotStrat == expStrat,
      s"folded sample_stratified diverged from exact arithmetic:\n" +
        s"spark=$gotStrat\nexact=$expStrat")
  }

  test("partitioned write prunes on the partition column") {
    val df = queries.ReshapeQueries.partitionedWritePrune(spark, TestSession.Sf)
    df.collect() // runs the write
    val read = spark.read.parquet(Scratch.dir("po", TestSession.Sf))
      .filter(col("o_orderstatus") === "F")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("o_orderstatus"), s"no partition pruning in:\n$plan")
  }

  test("dedup_cluster labels both ends of every near-dup pair identically") {
    val pairs = queries.DedupQueries.jaccardDedup(spark, Sf01)
      .select(col("d1"), col("d2"))
    val labels = queries.PipelineQueries.dedupCluster(spark, Sf01)
    val lab = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ps = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(ps.nonEmpty, "fixture has no near-dup pairs at sf0.01")
    ps.foreach { case (a, b) =>
      assert(lab(a) == lab(b), s"pair ($a,$b) split across clusters")
    }
    // every representative is the min of its component
    lab.groupBy(_._2).foreach { case (rep, members) =>
      assert(rep == members.keys.min)
    }
  }

  test("sample_split_safe never splits a near-dup pair across train/eval") {
    val split = queries.PipelineQueries.splitLeakageSafe(spark, Sf01)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // covers EVERY document, not just clustered ones
    val nDocs = Tables.documents(spark, Sf01).count()
    assert(split.size == nDocs)
    // the leakage property: both ends of every near-dup pair land on
    // the same side of the split
    val ps = queries.DedupQueries.jaccardDedup(spark, Sf01)
      .select(col("d1"), col("d2"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(ps.nonEmpty)
    ps.foreach { case (a, b) =>
      assert(split(a) == split(b), s"near-dup pair ($a,$b) leaked across the split")
    }
    // both sides are populated (80/20 target)
    val train = split.valuesIterator.count(_ == "train")
    assert(train > 0 && train < split.size)
  }

  test("mix_temperature: min-resource language keeps everything, rates " +
      "fall monotonically with language mass") {
    val rates = queries.PipelineQueries.mixTemperature(spark, Sf01)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val mass = Tables.documents(spark, Sf01).groupBy(col("lang"))
      .agg(sum(col("n_chars")).as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rates.keySet == mass.keySet,
      "every language must survive sampling at these rates")
    // (q_min/q_min)^0.3 = 1 exactly: the scarcest language is untouched
    val minLang = mass.minBy(_._2)._1
    assert(rates(minLang) == 1000000L)
    // temperature flattening: more mass -> lower (or equal) keep rate
    val byMass = mass.toSeq.sortBy(_._2).map { case (l, _) => rates(l) }
    assert(byMass.zip(byMass.tail).forall { case (a, b) => a >= b },
      s"rates not monotone in language mass: $byMass")
  }

  test("text_decontam only flags non-benchmark docs with real collisions") {
    val df = queries.PipelineQueries.textDecontam(spark, Sf01)
    val rows = df.collect()
    assert(rows.forall(_.getLong(1) >= 1)) // n_shared >= 1
    val benchIds = Tables.documents(spark, Sf01)
      .filter(col("source") === "src0")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rows.forall(r => !benchIds.contains(r.getLong(0))))
  }

  test("text_decontam_bloom equals the exact join and probes pre-shuffle") {
    val exact = queries.PipelineQueries.textDecontam(spark, Sf01)
    val bloom = queries.PipelineQueries.textDecontamBloom(spark, Sf01)
    assert(bloom.collect().toSeq == exact.collect().toSeq)
    // the sketch probe must be planned (a narrow filter before the join),
    // not optimized away
    val plan = bloom.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"no Bloom probe in:\n$plan")
  }

  test("text_quality_filter keep bit agrees with the reason ladder") {
    val rows = queries.PipelineQueries.textQualityFilter(spark, Sf01).collect()
    rows.foreach { r =>
      val keep = r.getInt(r.fieldIndex("keep"))
      val reason = r.getString(r.fieldIndex("reason"))
      assert((keep == 1) == (reason == "ok"), s"row $r")
    }
    // the gate must actually discriminate on this corpus
    assert(rows.exists(_.getInt(rows.head.fieldIndex("keep")) == 1))
    assert(rows.exists(_.getInt(rows.head.fieldIndex("keep")) == 0))
  }
}

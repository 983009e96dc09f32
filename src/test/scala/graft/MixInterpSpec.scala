package graft

import graft.queries.{PipelineQueries, TimeseriesQueries}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the training-mixture sampler and the linear
  * interpolation resample that the DuckDB hash check can't express:
  * the mixture property itself (kept mass tracks the target weights),
  * the whole-kept binding language, and lerp bounds/pass-through. */
class MixInterpSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("mix_weighted keeps the binding language whole and tracks the target mixture") {
    val out = PipelineQueries.mixWeighted(spark, TestSession.Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length == 5)
    // exactly the binding language carries rate 1e6 (kept whole); every
    // rate is a valid ppm
    val whole = out.filter(_._2 == 1000000L)
    assert(whole.length >= 1, s"no binding language in $out")
    assert(out.forall(r => r._2 > 0 && r._2 <= 1000000L))
    val langDocs = Tables.documents(spark, TestSession.Sf)
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    whole.foreach { case (lang, _, nDocs, _) =>
      assert(nDocs == langDocs(lang),
        s"binding lang $lang dropped docs: kept $nDocs of ${langDocs(lang)}")
    }
    // kept char mass follows the target weights up to hash-sampling
    // noise (each language keeps a Bernoulli subset of few hundred docs)
    val weights = Map("en" -> 0.30, "de" -> 0.20, "es" -> 0.20,
      "fr" -> 0.15, "zh" -> 0.15)
    val totalKept = out.map(_._4).sum.toDouble
    out.foreach { case (lang, _, _, chars) =>
      val share = chars / totalKept
      val target = weights(lang)
      assert(math.abs(share - target) / target < 0.35,
        s"$lang kept share $share vs target $target")
    }
  }

  test("cluster-balanced sampling keeps the scarcest cell whole, " +
      "rates are valid ppm, and no cell keeps grossly more than the " +
      "target mass") {
    val out = queries.VectorQueries
      .sampleClusterBalanced(spark, TestSession.Sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    // the binding (scarcest) cell carries rate exactly 1e6 and keeps
    // everything — the construction's invariant, like mix_weighted's
    val whole = out.filter(_._3 == 1000000L)
    assert(whole.nonEmpty, s"no binding cell at rate 1e6 in ${out.toSeq}")
    whole.foreach { case (cell, n, _, kept) =>
      assert(kept == n, s"binding cell $cell dropped rows: $kept of $n")
    }
    out.foreach { case (_, n, rate, kept) =>
      assert(rate > 0 && rate <= 1000000L)
      assert(kept <= n)
    }
    // balance: every cell's kept mass lands near the scarcest cell's
    // (deterministic-hash thinning is Bernoulli-like, so the bound is
    // loose — the property is no cell retains a multiple of the target)
    val m = out.map(_._2).min
    out.foreach { case (cell, _, _, kept) =>
      assert(kept <= 2 * m + 8,
        s"cell $cell kept $kept vs target mass $m — not balanced")
    }
  }

  test("the multiplicative hash survives doc ids beyond 2^32 " +
      "(BenchFocus-scale id domains: fold-first, no silent wrap)") {
    // the unfolded id·2654435761 form wraps Spark's non-ANSI multiply
    // for ids ≥ ~3.5e9 while DuckDB raises out-of-range — the folded
    // idiom (id % 2³¹ first) must agree with exact BigInt arithmetic
    // on a synthetic corpus whose ids start at 2³³
    val dir = Scratch.dir("hash64_docs", "hash64")
    val base = 8589934592L // 2^33
    val rows = (0 until 60).map { i =>
      (base + i.toLong * 1000000007L, s"synthetic doc $i",
        if (i % 2 == 0) "en" else "de", "srcX", 100L + i)
    }
    spark.createDataFrame(rows)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def h(id: Long): Long =
      ((BigInt(id) mod BigInt(2147483648L)) * BigInt(2654435761L) mod
        BigInt(4294967296L) mod BigInt(1000000L)).toLong
    val expected = rows.groupBy(_._3).flatMap { case (lang, rs) =>
      rs.map(r => (r._1, r._5, r._5 * 1000000000L / (h(r._1) + 1L)))
        .sortBy(t => (-t._3, t._1)).take(20).zipWithIndex
        .map { case ((id, nc, q), i) => (lang, i + 1, id, nc, q) }
    }.toSet
    val out = PipelineQueries.samplePriority(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(out == expected,
      s"folded-hash priority sample diverged from exact arithmetic:\n" +
        s"only-spark=${(out -- expected).take(5)}\n" +
        s"only-exact=${(expected -- out).take(5)}")
  }

  test("ts_interpolate passes observed hours through and bounds gap hours by their neighbors") {
    val out = TimeseriesQueries.tsInterpolate(spark, TestSession.Sf)
    val gap = TimeseriesQueries.tsGapfill(spark, TestSession.Sf)
    assert(out.count() == gap.count(), "interp grid must equal gapfill grid")

    val hourly = Tables.events(spark, TestSession.Sf)
      .filter(col("user_id") < 20)
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hr"))
      .agg(queries.dsum(col("value")).as("obs"))
    val joined = out.join(hourly, Seq("user_id", "hr"), "left").collect()
    val observed = joined.filter(!_.isNullAt(3))
    assert(observed.nonEmpty)
    observed.foreach { r =>
      assert(math.abs(r.getDouble(2) - r.getDouble(3)) < 1e-9,
        s"observed hour not passed through: $r")
    }
    // every gap row sits within [min(prev,next), max(prev,next)]; with
    // per-user grids over [min,max] observed hours, neighbors of a gap
    // are the nearest observed hours on each side
    import org.apache.spark.sql.expressions.Window
    val wb = Window.partitionBy(col("user_id")).orderBy(col("hr"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(col("user_id")).orderBy(col("hr"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val bounded = out.join(hourly, Seq("user_id", "hr"), "left")
      .select(col("user_id"), col("hr"), col("v_interp"), col("obs"),
        last(col("obs"), ignoreNulls = true).over(wb).as("pv"),
        first(col("obs"), ignoreNulls = true).over(wf).as("nv"))
      .filter(col("obs").isNull)
      .collect()
    assert(bounded.nonEmpty, "fixture has no gap hours for user_id < 20")
    bounded.foreach { r =>
      val (v, pv, nv) = (r.getDouble(2), r.getDouble(4), r.getDouble(5))
      // the integer round-half-up moves the lerp by at most 0.5 milli
      assert(v >= math.min(pv, nv) - 5e-4 && v <= math.max(pv, nv) + 5e-4,
        s"gap value outside neighbor bounds: $r")
    }
  }

  test("mix_upsample: rates in [1, 4] epochs, the largest language " +
      "emits exactly once, every language emits at least its source") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, TestSession.Sf)
    val srcCounts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"),
      sum(col("n_chars")).as("t")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val biggest = srcCounts.maxBy(_._2._2)._1
    val rows = graft.queries.PipelineQueries
      .mixUpsample(spark, TestSession.Sf).collect()
    assert(rows.map(_.getString(0)).toSet == srcCounts.keySet,
      "a language vanished from the upsampled mixture")
    rows.foreach { r =>
      val (lang, rate, emitted) =
        (r.getString(0), r.getLong(1), r.getLong(2))
      assert(rate >= 1000000L && rate <= 4000000L,
        s"$lang rate $rate outside [1e6, 4e6] ppm")
      val srcN = srcCounts(lang)._1
      assert(emitted >= srcN,
        s"$lang upsample lost documents: $emitted < $srcN")
      assert(emitted <= 4 * srcN + 1,
        s"$lang exceeded the 4-epoch cap: $emitted vs $srcN source")
      if (lang == biggest)
        assert(rate == 1000000L && emitted == srcN,
          s"largest language must emit exactly once: $rate, " +
            s"$emitted vs $srcN")
    }
  }
}

package graft.tools

import graft.{Engine, SparkEntry}

/** Dev-only: repeat-time a subset of declared queries to separate real
  * regressions from container noise. args = query names (default: the
  * historically hot set); each runs REPS times after one warm-up.
  */
object BenchFocus {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "dedup_jaccard", "dedup_minhash", "dedup_simhash", "agg_percentile",
      "sim_cosine_neardup", "sim_ann_ivf", "sim_ann_lsh", "json_kv_agg",
      "scalar_string", "set_except_all")
    val spark = Engine.sessionBuilder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(n: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    try run("q1_pricing_summary") catch { case _: Throwable => () }
    names.foreach { n =>
      val ts = (1 to reps).map(_ => run(n))
      println(f"FOCUS $n%-24s min=${ts.min}%6.2f med=${ts.sorted.apply(reps / 2)}%6.2f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}

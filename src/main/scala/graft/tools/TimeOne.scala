package graft.tools

/** Standalone per-query timer: warm + min-of-2 noop-sink runs for the
  * named queries on SPARK_GRAFT_SF_DIR — the same methodology as the
  * full Bench, minus family context. For outlier triage (is a slow
  * official reading the plan or the machine?) without hand-writing a
  * throwaway main each round. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // session sized exactly like Bench's — a triage number measured on
    // a different core count would misattribute the gap to contention
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark =
      graft.Engine.sessionBuilder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(n: String): Unit = graft.SparkEntry.queries(n)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    for (n <- args) {
      run(n) // warm
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); run(n); (System.nanoTime() - t0) / 1e9
      }
      println(f"TIME $n ${ts.min}%.2f")
    }
    spark.stop()
  }
}

package graft.tools

import graft.{Engine, SparkEntry}

/** Dev scratch: time declared queries standalone with Bench's own
  * methodology (noop sink, warm-up, min of 2 timed passes). */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Engine.sessionBuilder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- args(0).split(",")) {
      def run(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run() // warm-up
      val t = math.min(run(), run())
      println(f"TIME $name $t%.2f s")
    }
    spark.stop()
  }
}

package graft.tools

import graft.{Engine, SparkEntry}

/** Dev scratch: print the full formatted plan for one declared query. */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val spark = Engine.local(4)
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val df = SparkEntry.queries(name)(spark, dir)
    println("=== EXPLAIN " + name)
    df.explain("formatted")
    spark.stop()
  }
}

package graft.tools

import graft.{Engine, SparkEntry}

/** Dev scratch: execute one declared query and dump its final adaptive
  * physical plan, for chasing exchange-reuse / stage-shape issues. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = Engine.local(8)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val df = SparkEntry.queries(args(0))(spark, sfDir)
    df.collect()
    val exec = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }
    // stringify WITH stage interiors: toString hides QueryStage bodies
    def dump(p: org.apache.spark.sql.execution.SparkPlan, depth: Int)
        : Unit = {
      println(("  " * depth) + p.nodeName + " " +
        p.verboseString(40).take(160))
      p match {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          dump(q.plan, depth + 1)
        case _ => p.children.foreach(dump(_, depth + 1))
      }
    }
    dump(exec, 0)
    spark.stop()
  }
}

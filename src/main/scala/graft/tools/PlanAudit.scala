package graft.tools

import graft.{Engine, SparkEntry}

/** Dev tool: dump physical-plan signals for every declared query —
  * which join strategies fire, whether parquet scans carry
  * PushedFilters, and whole-stage-codegen coverage. Reviewing this
  * output is the "iterate until it's the plan you'd want" loop. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = Engine.local(4)
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val interesting = if (args.length > 1) args(1).split(",").toSet
    else Set.empty[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
         if interesting.isEmpty || interesting(name)) {
      try {
        val df = fn(spark, sfDir)
        // EXECUTE before stringifying: under AQE the pre-execution plan
        // is an AdaptiveSparkPlan placeholder whose WholeStageCodegen
        // stages only materialize per query stage at runtime — the
        // audit would report codegen=0 for every query and could never
        // catch a real codegen regression. After collect() the
        // adaptive node's executedPlan is the FINAL plan with its
        // codegen spans, runtime-chosen joins and coalesced exchanges.
        df.collect()
        val exec = df.queryExecution.executedPlan
        val finalPlan = exec match {
          case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => a.executedPlan
          case p => p
        }
        val plan = finalPlan.toString
        val joins = "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)".r
          .findAllIn(plan).toSeq.groupBy(identity).map { case (k, v) => s"$k×${v.size}" }
        val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findAllIn(plan).toSeq
          .count(!_.contains("[]"))
        val exchanges = "Exchange ".r.findAllIn(plan).size
        // codegen'd operators print as `*(stageId) Operator` in the
        // executed plan string (WholeStageCodegenExec collapses to the
        // star prefix); distinct stage ids = whole-stage spans
        val codegenSpans = "\\*\\((\\d+)\\)".r.findAllMatchIn(plan)
          .map(_.group(1)).toSet.size
        println(s"PLAN $name joins=${joins.mkString("+")} " +
          s"pushedScans=$pushed exchanges=$exchanges codegen=$codegenSpans")
      } catch {
        case e: Throwable => println(s"PLAN $name ERROR ${e.getMessage}")
      }
    }
    spark.stop()
  }
}

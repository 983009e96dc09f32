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
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val joins = "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)".r
          .findAllIn(plan).toSeq.groupBy(identity).map { case (k, v) => s"$k×${v.size}" }
        val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findAllIn(plan).toSeq
          .count(!_.contains("[]"))
        val exchanges = "Exchange ".r.findAllIn(plan).size
        val codegenSpans = "WholeStageCodegen".r.findAllIn(plan).size
        println(s"PLAN $name joins=${joins.mkString("+")} " +
          s"pushedScans=$pushed exchanges=$exchanges codegen=$codegenSpans")
      } catch {
        case e: Throwable => println(s"PLAN $name ERROR ${e.getMessage}")
      }
    }
    spark.stop()
  }
}

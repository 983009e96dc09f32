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
        // Pushdown is counted STRUCTURALLY, not by string-matching the
        // plan dump: DSv2 BatchScan nodes truncate their scan
        // description, so `pushed=[...]` often never appears in the
        // string and arrow queries used to report pushedScans=0
        // spuriously. Walk the executed plan (descending into AQE
        // query stages, which are leaf-like wrappers `collect` does
        // not traverse) and ask each scan node directly.
        def scansOf(p: org.apache.spark.sql.execution.SparkPlan)
            : Seq[Int] = p.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            Seq(if (f.metadata.get("PushedFilters")
              .exists(v => v != "[]" && v.nonEmpty)) 1 else 0)
          case b: org.apache.spark.sql.execution.datasources.v2
              .BatchScanExec =>
            Seq(b.scan match {
              case s: graft.sources.arrow.ArrowScan =>
                if (s.pushedPredicates.nonEmpty ||
                  b.runtimeFilters.nonEmpty) 1 else 0
              // a pushed-aggregate scan IS the deepest pushdown: the
              // source answered the query from footer stats
              case _: graft.sources.arrow.ArrowAggScan => 1
              case other =>
                if (other.description().matches(
                  "(?s).*(pushed|Pushed)[A-Za-z]*[=:]\\s*\\[[^\\]]+\\].*"))
                  1
                else 0
            })
          case q: org.apache.spark.sql.execution.adaptive
              .QueryStageExec => scansOf(q.plan)
          case s: org.apache.spark.sql.execution.adaptive
              .AdaptiveSparkPlanExec => scansOf(s.executedPlan)
        }.flatten
        val pushed = scansOf(finalPlan).sum
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

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
        def unwrapA(p: org.apache.spark.sql.execution.SparkPlan)
            : org.apache.spark.sql.execution.SparkPlan = p match {
          case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => a.executedPlan
          case other => other
        }
        val finalPlan = unwrapA(exec)
        // Every signal below is counted STRUCTURALLY by one walker
        // that descends (a) AQE query stages, which `collect` treats
        // as leaves, and (b) each distinct cached relation's plan —
        // queries that persist-materialize-unpersist return an
        // InMemoryTableScan whose STRING nests the whole cached tree,
        // so string-counting would double/blow up the signals.
        // Dedup is per `all` call (an IdentityHashMap per walk), so a
        // relation scanned twice in one plan audits once.
        def all[T](f: PartialFunction[
            org.apache.spark.sql.execution.SparkPlan, Seq[T]]): Seq[T] = {
          val seen = java.util.Collections.newSetFromMap(
            new java.util.IdentityHashMap[AnyRef, java.lang.Boolean]())
          def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[T] =
            p.collect(f.orElse {
              case q: org.apache.spark.sql.execution.adaptive
                  .QueryStageExec => walk(q.plan)
              case s: org.apache.spark.sql.execution.adaptive
                  .AdaptiveSparkPlanExec => walk(s.executedPlan)
              case i: org.apache.spark.sql.execution.columnar
                  .InMemoryTableScanExec =>
                if (seen.add(i.relation))
                  walk(unwrapA(i.relation.cachedPlan))
                else Seq.empty[T]
            }).flatten
          walk(finalPlan)
        }
        val joinNames = all {
          case j: org.apache.spark.sql.execution.joins.BaseJoinExec =>
            Seq(j.getClass.getSimpleName.stripSuffix("Exec"))
        }
        val joins = joinNames.groupBy(identity)
          .map { case (k, v) => s"$k×${v.size}" }
        // Pushdown is counted STRUCTURALLY, not by string-matching the
        // plan dump: DSv2 BatchScan nodes truncate their scan
        // description, so `pushed=[...]` often never appears in the
        // string and arrow queries used to report pushedScans=0
        // spuriously. Walk the executed plan (descending into AQE
        // query stages, which are leaf-like wrappers `collect` does
        // not traverse) and ask each scan node directly.
        val pushed = all[Int] {
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
        }.sum
        val exchanges = all {
          case _: org.apache.spark.sql.execution.exchange
              .ShuffleExchangeLike => Seq(1)
        }.size
        val codegenSpans = all {
          case w: org.apache.spark.sql.execution
              .WholeStageCodegenExec => Seq(w.codegenStageId)
        }.toSet.size
        println(s"PLAN $name joins=${joins.mkString("+")} " +
          s"pushedScans=$pushed exchanges=$exchanges codegen=$codegenSpans")
      } catch {
        case e: Throwable => println(s"PLAN $name ERROR ${e.getMessage}")
      }
    }
    spark.stop()
  }
}

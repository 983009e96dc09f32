package graft.tools

import org.apache.spark.sql.functions._

import graft.Engine
import graft.sources.arrow.ArrowDataSource

/** Cross-process mergeSchema-vs-mergeSchema soak (run on demand:
  * `sbt "Test/runMain graft.tools.MergeSchemaRace"`). A child Spark
  * JVM merge-appends batches carrying a column `c_child` the table has
  * never seen while the parent races merge-appends carrying
  * `c_parent`. The declaration replace is a generation-addressed
  * COMPARE-AND-SWAP (ArrowDataSource.casDeclaredSchema): a writer
  * losing a generation claim recomputes against the fresh declaration
  * and re-publishes, so the race is a retry, never a heal. Invariants:
  *  - zero rows lost (blind appends rebase; the schema race must
  *    never turn into data loss);
  *  - the final table reads with BOTH columns IMMEDIATELY — zero
  *    heals (pre-CAS, the two-sided re-assert interleave occasionally
  *    required one documented heal append; the CAS closes that
  *    window by construction, and this soak enforces the closure);
  *  - both columns' values serve correctly from their rows.
  * Lives in test scope so it compiles with the suite but only runs
  * when invoked (two Spark JVMs ≈ 60–90 s). */
object MergeSchemaRaceChild {
  def main(args: Array[String]): Unit = {
    val (dir, n) = (args(0), args(1).toInt)
    val spark = Engine.sessionBuilder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    for (b <- 0 until n) {
      (0 until 10).map(j =>
        (200000L + b * 100 + j, 1L, s"ch_${b}_$j"))
        .toDF("id", "amt", "c_child")
        .coalesce(1).write.format("arrow").mode("append")
        .option("mergeSchema", "true").save(dir)
    }
    println("MSRACE_CHILD_DONE")
    spark.stop()
  }
}

object MergeSchemaRace {
  def main(args: Array[String]): Unit = {
    val spark = Engine.sessionBuilder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir =
      java.nio.file.Files.createTempDirectory("msrace").toString
    (1 to 500).map(i => (i.toLong, i.toLong * 2))
      .toDF("id", "amt")
      .repartition(2).write.format("arrow").mode("overwrite").save(dir)
    ArrowDataSource.initTableLog(dir)
    val javaBin = java.nio.file.Paths
      .get(System.getProperty("java.home"), "bin", "java").toString
    val opts = Seq("--add-opens=java.base/java.lang=ALL-UNNAMED",
      "--add-opens=java.base/java.lang.invoke=ALL-UNNAMED",
      "--add-opens=java.base/java.lang.reflect=ALL-UNNAMED",
      "--add-opens=java.base/java.io=ALL-UNNAMED",
      "--add-opens=java.base/java.net=ALL-UNNAMED",
      "--add-opens=java.base/java.nio=ALL-UNNAMED",
      "--add-opens=java.base/java.util=ALL-UNNAMED",
      "--add-opens=java.base/java.util.concurrent=ALL-UNNAMED",
      "--add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED",
      "--add-opens=java.base/sun.nio.ch=ALL-UNNAMED",
      "--add-opens=java.base/sun.nio.cs=ALL-UNNAMED",
      "--add-opens=java.base/sun.security.action=ALL-UNNAMED",
      "--add-opens=java.base/sun.util.calendar=ALL-UNNAMED",
      "-Dspark.ui.enabled=false", "-Xmx2g")
    val nChild = 10
    val child = new ProcessBuilder(
      (Seq(javaBin) ++ opts ++ Seq("-cp",
        System.getProperty("java.class.path"),
        "graft.tools.MergeSchemaRaceChild", dir, nChild.toString)): _*)
      .redirectErrorStream(true).start()
    val root = java.nio.file.Paths.get(dir).toAbsolutePath.normalize
    val t0 = System.currentTimeMillis()
    while (ArrowDataSource.latestCommittedEpoch(root) < 1 &&
        System.currentTimeMillis() - t0 < 120000) Thread.sleep(50)
    require(ArrowDataSource.latestCommittedEpoch(root) >= 1,
      "child never committed its first append")
    val nParent = 8
    for (b <- 0 until nParent) {
      (0 until 10).map(j =>
        (300000L + b * 100 + j, 2L, s"pa_${b}_$j"))
        .toDF("id", "amt", "c_parent")
        .coalesce(1).write.format("arrow").mode("append")
        .option("mergeSchema", "true").save(dir)
    }
    val childOut = new String(child.getInputStream.readAllBytes, "UTF-8")
    require(child.waitFor() == 0, s"child failed:\n$childOut")
    require(childOut.contains("MSRACE_CHILD_DONE"))
    // final state: readable with both columns IMMEDIATELY — the CAS
    // declaration replace leaves no interleave window to heal, so a
    // failed read here is a BUG, not a documented race residue
    val heals = 0
    val df = spark.read.format("arrow").load(dir)
    df.collect()
    val cols = df.schema.fieldNames.toSet
    require(cols("c_child") && cols("c_parent"),
      s"final schema lost a raced column: $cols")
    val n = df.count()
    val expect = 500L + nChild * 10 + nParent * 10 + heals
    require(n == expect, s"rows lost under the schema race: $n != $expect")
    require(df.filter(col("c_child").startsWith("ch_")).count() ==
      nChild * 10, "child column values lost")
    require(df.filter(col("c_parent").startsWith("pa_")).count() ==
      nParent * 10, "parent column values lost")
    require(df.filter(col("id") <= 500 && (col("c_child").isNotNull ||
      col("c_parent").isNotNull)).count() == 0,
      "seed rows must serve the evolved columns as nulls")
    println(s"MSRACE heals=$heals rows=$n")
    println("MSRACE_OK")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.functions._

import graft.Engine
import graft.sources.arrow.ArrowDataSource

/** Cross-process PROCEDURE-vs-mergeSchema soak (run on demand:
  * `sbt "Test/runMain graft.tools.ProcedureRace"`) — the r15 review's
  * top finding, pinned cross-JVM: a child Spark JVM merge-appends
  * batches carrying `c_child` while the parent races `CALL
  * add_column` / `rename_column` / `drop_column` evolutions. The
  * procedures evolve through `evolveDeclaration`'s CAS loop, which
  * RECOMPUTES against the fresh declaration on every lost generation
  * claim — with precomputed content they would last-writer-wins the
  * child's column out of the declaration and its committed footers
  * would brick every read. Invariants:
  *  - the final table reads cleanly (no drift error, no heal);
  *  - `c_child` AND every parent-procedure effect survive: the added
  *    column exists, the renamed column serves its values under the
  *    new name, the dropped column is gone;
  *  - zero rows lost. */
object ProcedureRace {
  def main(args: Array[String]): Unit = {
    val spark = Engine.sessionBuilder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir =
      java.nio.file.Files.createTempDirectory("procrace").toString
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
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.arrow.GraftCatalog].getName)
    // parent races the schema procedures against the child's
    // mergeSchema appends: add 6 columns, rename one, drop one
    for (i <- 0 until 6) {
      spark.sql(s"CALL graft.system.add_column(path => '$dir', " +
        s"name => 'p_$i', type => 'string')").collect()
      Thread.sleep(40)
    }
    spark.sql(s"CALL graft.system.rename_column(path => '$dir', " +
      "old_name => 'p_0', new_name => 'p_renamed')").collect()
    spark.sql(s"CALL graft.system.drop_column(path => '$dir', " +
      "name => 'p_5')").collect()
    val childOut = new String(child.getInputStream.readAllBytes, "UTF-8")
    require(child.waitFor() == 0, s"child failed:\n$childOut")
    require(childOut.contains("MSRACE_CHILD_DONE"))
    // every evolution from BOTH processes must survive — no drift
    // error, no heal, no lost column
    val df = spark.read.format("arrow").load(dir)
    df.collect()
    val cols = df.schema.fieldNames.toSet
    require(cols("c_child"),
      s"a procedure last-writer-wins'd the child's column away: $cols")
    require(cols("p_renamed") && !cols("p_0"),
      s"the rename was lost under the race: $cols")
    require(!cols("p_5"), s"the drop was lost under the race: $cols")
    require((1 to 4).forall(i => cols(s"p_$i")),
      s"an add_column was lost under the race: $cols")
    val n = df.count()
    require(n == 500L + nChild * 10,
      s"rows lost under the procedure race: $n")
    require(df.filter(col("c_child").startsWith("ch_")).count() ==
      nChild * 10, "child column values lost")
    println(s"PROCRACE cols=${cols.size} rows=$n")
    println("PROCRACE_OK")
    spark.stop()
  }
}

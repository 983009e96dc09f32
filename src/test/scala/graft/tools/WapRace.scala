package graft.tools

import org.apache.spark.sql.functions._

import graft.Engine
import graft.sources.arrow.ArrowDataSource

/** Cross-process WRITE-AUDIT-PUBLISH race soak (run on demand:
  * `sbt "Test/runMain graft.tools.WapRace"`). A child Spark JVM
  * blind-appends batches to MAIN while the parent repeatedly clones a
  * branch, stages a DELETE on it, and publishes — the publish races
  * the child's epoch commits from a DIFFERENT process. Invariants per
  * round: a publish either lands atomically (main == the branch state
  * plus any appends that rebased after it) or refuses with the
  * concurrent-modification error leaving main untouched; across the
  * whole soak no child append is lost and every published deletion
  * holds. Refusals > 0 must be observed (the race is real). Lives in
  * test scope; two Spark JVMs ≈ 60–90 s. */
object WapRaceChild {
  def main(args: Array[String]): Unit = {
    val (dir, n) = (args(0), args(1).toInt)
    val spark = Engine.sessionBuilder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    for (b <- 0 until n) {
      (0 until 5).map(j => (500000L + b * 100 + j, s"child_${b}_$j"))
        .toDF("id", "tag")
        .coalesce(1).write.format("arrow").mode("append").save(dir)
      Thread.sleep(150)
    }
    println("WAPRACE_CHILD_DONE")
    spark.stop()
  }
}

object WapRace {
  def main(args: Array[String]): Unit = {
    val spark = Engine.sessionBuilder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.arrow.GraftCatalog].getName)
    import spark.implicits._
    val main = java.nio.file.Files.createTempDirectory("waprace").toString
    (1 to 400).map(i => (i.toLong, s"seed_$i")).toDF("id", "tag")
      .repartition(2).write.format("arrow").mode("overwrite").save(main)
    ArrowDataSource.initTableLog(main)
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
    val nChild = 20
    val child = new ProcessBuilder(
      (Seq(javaBin) ++ opts ++ Seq("-cp",
        System.getProperty("java.class.path"),
        "graft.tools.WapRaceChild", main, nChild.toString)): _*)
      .redirectErrorStream(true).start()
    val root = java.nio.file.Paths.get(main).toAbsolutePath.normalize
    val t0 = System.currentTimeMillis()
    while (ArrowDataSource.latestCommittedEpoch(root) < 1 &&
        System.currentTimeMillis() - t0 < 120000) Thread.sleep(50)

    // parent: clone → stage DELETE of one seed slice → publish,
    // rounds continuing while the child appends
    var published = Set.empty[Long] // seed ids deleted via a publish
    var landed = 0
    var refused = 0
    for (k <- 0 until 8) {
      val lo = 1L + k * 40
      val branch = java.nio.file.Files
        .createTempDirectory(s"waprace_b$k").toString
      java.nio.file.Files.delete(java.nio.file.Paths.get(branch))
      spark.sql(s"CALL graft.system.clone(src_path => '$main', " +
        s"dst_path => '$branch')").collect()
      spark.sql(s"DELETE FROM graft.arrow.`$branch` " +
        s"WHERE id >= $lo AND id < ${lo + 20}")
      try {
        spark.sql(s"CALL graft.system.publish(" +
          s"branch_path => '$branch', main_path => '$main')").collect()
        landed += 1
        published ++= (lo until (lo + 20))
      } catch {
        case e: Throwable
            if Iterator.iterate(e: Throwable)(_.getCause)
              .takeWhile(_ != null).exists(t =>
                t.isInstanceOf[java.util.ConcurrentModificationException] ||
                  String.valueOf(t.getMessage).contains("re-clone")) =>
          refused += 1
          // a refused publish must leave the staged slice intact on
          // main AND the branch fully readable (the move rollback
          // restored its files)
          val still = spark.read.format("arrow").load(main)
            .filter(col("id") >= lo && col("id") < lo + 20).count()
          require(still == 20,
            s"round $k: refused publish mutated main (slice=$still)")
          val branchRows = spark.read.format("arrow").load(branch).count()
          require(branchRows > 0 &&
            spark.read.format("arrow").load(branch)
              .filter(col("id") >= lo && col("id") < lo + 20)
              .count() == 0,
            s"round $k: refused publish broke the branch " +
              s"(rows=$branchRows)")
      }
    }
    val childOut = new String(child.getInputStream.readAllBytes, "UTF-8")
    require(child.waitFor() == 0, s"child failed:\n$childOut")
    require(childOut.contains("WAPRACE_CHILD_DONE"))
    // invariants over the final state
    val rows = spark.read.format("arrow").load(main)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    val expectSeed = (1L to 400L).toSet -- published
    val expectChild = (0 until nChild).flatMap(b =>
      (0 until 5).map(j => 500000L + b * 100 + j)).toSet
    val missSeed = expectSeed -- rows
    val resurrected = rows.filter(_ < 500000L) -- expectSeed
    val missChild = expectChild -- rows
    println(s"WAPRACE landed=$landed refused=$refused " +
      s"missSeed=${missSeed.size} resurrected=${resurrected.size} " +
      s"missChild=${missChild.size}")
    require(landed > 0, "no publish ever landed — soak inconclusive")
    require(missSeed.isEmpty, s"seed rows LOST: ${missSeed.take(5)}")
    require(resurrected.isEmpty,
      s"published deletions UNDONE: ${resurrected.take(5)}")
    require(missChild.isEmpty,
      s"child appends LOST under publish race: ${missChild.take(5)}")
    println("WAPRACE_OK")
    spark.stop()
  }
}

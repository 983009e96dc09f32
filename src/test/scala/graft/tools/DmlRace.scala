package graft.tools

import org.apache.spark.sql.functions._

import graft.Engine
import graft.sources.arrow.ArrowDataSource

/** Cross-process DML-vs-append soak (run on demand:
  * `sbt "Test/runMain graft.tools.DmlRace"`). A child Spark JVM blind-
  * appends 12 batches while the parent races 10 copy-on-write DELETEs
  * over the seed id range, retrying on optimistic-concurrency
  * conflicts. Invariants: no seed row lost, no deleted row
  * resurrected, no child append lost, conflicts > 0 observed and
  * absorbed. Lives in test scope so it compiles with the suite but
  * only runs when invoked (two Spark JVMs ≈ 60–90 s). Round 11: 3/3
  * clean with 2 conflicts each. */
/** Child appender: N spark batch appends of 10 rows each. */
object DmlRaceChild {
  def main(args: Array[String]): Unit = {
    val (dir, n) = (args(0), args(1).toInt)
    val spark = Engine.sessionBuilder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    for (b <- 0 until n) {
      (0 until 10).map(j => (100000L + b * 100 + j, s"child_${b}_$j"))
        .toDF("id", "tag")
        .coalesce(1).write.format("arrow").mode("append").save(dir)
    }
    println("DMLRACE_CHILD_DONE")
    spark.stop()
  }
}
/** Parent: seeds the table, spawns the child, races CoW DELETEs over
  * the PARENT-SEEDED id range only, then checks invariants. */
object DmlRace {
  def main(args: Array[String]): Unit = {
    val spark = Engine.sessionBuilder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.arrow.GraftCatalog].getName)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dmlrace").toString
    (1 to 500).map(i => (i.toLong, s"seed_$i")).toDF("id", "tag")
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
    val nChild = 12
    val child = new ProcessBuilder(
      (Seq(javaBin) ++ opts ++ Seq("-cp",
        System.getProperty("java.class.path"),
        "graft.tools.DmlRaceChild", dir, nChild.toString)): _*)
      .redirectErrorStream(true).start()
    // wait until the child's FIRST append lands so the delete loop
    // genuinely interleaves with its remaining commits
    val root = java.nio.file.Paths.get(dir).toAbsolutePath.normalize
    val t0 = System.currentTimeMillis()
    while (ArrowDataSource.latestCommittedEpoch(root) < 1 &&
        System.currentTimeMillis() - t0 < 120000) Thread.sleep(50)
    require(ArrowDataSource.latestCommittedEpoch(root) >= 1,
      "child never committed its first append")
    // parent: CoW DELETEs over seed ids only, retrying on conflicts
    var deleted = Set.empty[Long]
    var conflicts = 0
    for (k <- 0 until 10) {
      val lo = 1L + k * 50
      var done = false
      var tries = 0
      while (!done && tries < 30) {
        try {
          spark.sql(s"DELETE FROM graft.arrow.`$dir` " +
            s"WHERE id >= $lo AND id < ${lo + 25}")
          done = true
        } catch {
          case e: Throwable
              if String.valueOf(e.getMessage).contains("retry") ||
                Iterator.iterate(e: Throwable)(_.getCause)
                  .takeWhile(_ != null).exists(
                    _.isInstanceOf[java.util.ConcurrentModificationException]) =>
            conflicts += 1; tries += 1
        }
      }
      require(done, s"DELETE $k never landed after $tries conflicts")
      deleted ++= (lo until (lo + 25))
    }
    val childOut = new String(child.getInputStream.readAllBytes, "UTF-8")
    require(child.waitFor() == 0, s"child failed:\n$childOut")
    require(childOut.contains("DMLRACE_CHILD_DONE"))
    // invariants
    val rows = spark.read.format("arrow").load(dir)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    val expectSeed = (1L to 500L).toSet -- deleted
    val expectChild = (0 until nChild).flatMap(b =>
      (0 until 10).map(j => 100000L + b * 100 + j)).toSet
    val missSeed = expectSeed -- rows
    val extraSeed = (rows.filter(_ < 100000L)) -- expectSeed
    val missChild = expectChild -- rows
    println(s"DMLRACE conflicts=$conflicts rows=${rows.size} " +
      s"missSeed=${missSeed.size} extraSeed=${extraSeed.size} " +
      s"missChild=${missChild.size}")
    require(missSeed.isEmpty, s"seed rows LOST: ${missSeed.take(5)}")
    require(extraSeed.isEmpty,
      s"deleted rows RESURRECTED: ${extraSeed.take(5)}")
    require(missChild.isEmpty,
      s"child appends LOST under DML race: ${missChild.take(5)}")
    println("DMLRACE_OK")
    spark.stop()
  }
}

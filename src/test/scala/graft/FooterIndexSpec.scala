package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.arrow.{ArrowDataSource, FooterIndexFile}

/** Write-time footer-stats sidecar ([[FooterIndexFile]]): planning an
  * Arrow directory must cost ONE metadata read, not O(files) footer
  * opens — the flat-100k-file-directory fix. The sidecar is captured
  * by the writing tasks (no re-reads), exact (equal to a footer
  * sweep), merged across appends, and strictly optional (deleting it
  * falls back to the sweep with identical results). */
class FooterIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  /** A directory exercising every stat kind the index carries: zone
    * maps + row stats (numeric cols), a Bloom column, sort stamp,
    * explicit codec. */
  private def writeFixture(dir: String): Unit =
    spark.range(4000).selectExpr(
      "id AS k", "CAST(id % 97 AS DOUBLE) AS v",
      "CONCAT('u', CAST(id % 50 AS STRING)) AS tag")
      .repartitionByRange(4, col("k"))
      .sortWithinPartitions(col("k"))
      .write.format("arrow")
      .option("codec", "zstd")
      .option("bloomFilterColumns", "tag")
      .option("sortBy", "k")
      .mode("overwrite").save(dir)

  test("the sidecar exists after a write, covers every file, and its " +
      "stats equal a footer sweep exactly") {
    val dir = Files.createTempDirectory("fidx_eq").toString
    writeFixture(dir)
    val root = Paths.get(dir).toAbsolutePath.normalize
    val files = ArrowDataSource.visibleIpcFiles(dir)
    assert(files.nonEmpty)
    val idx = FooterIndexFile.load(root)
      .getOrElse(fail("no sidecar written"))
    for (f <- files) {
      val rel = root.relativize(f.toAbsolutePath.normalize).toString
      val got = idx.infoOf(rel)
        .getOrElse(fail(s"file $rel missing from sidecar"))
      val swept = ArrowDataSource.footerInfo(f)
      // canonical comparison: both render through the same encoder
      assert(FooterIndexFile.encodeInfo(got) ==
        FooterIndexFile.encodeInfo(swept), s"stats diverge for $rel")
      assert(idx.schemaOf(rel).map(_.fields.toSeq.map(x =>
        (x.name, x.dataType))) ==
        Some(ArrowDataSource.readFooterSchema(f).fields.toSeq.map(x =>
          (x.name, x.dataType))), s"schema diverges for $rel")
    }
  }

  test("planning an indexed directory opens ZERO data-file footers — " +
      "inference, stats, split planning and zone-map pruning all " +
      "resolve from one metadata file") {
    val dir = Files.createTempDirectory("fidx_plan").toString
    writeFixture(dir)
    val before = ArrowDataSource.footerOpens.get
    val df = spark.read.format("arrow").load(dir)
      .filter(col("k") >= 100 && col("k") < 200)
    val scan = df.queryExecution.executedPlan
      .collectFirst { case b: BatchScanExec => b }
      .getOrElse(fail("no BatchScanExec in plan"))
    val parts = scan.inputPartitions // forces split planning + pruning
    assert(ArrowDataSource.footerOpens.get == before,
      "planning opened data-file footers despite the sidecar")
    // the sidecar's zone maps PRUNE: a 100-key range over 4 range-
    // partitioned files must not plan every batch of every file
    assert(parts.nonEmpty)
    // and the full read stays exact
    assert(df.count() == 100)
    assert(ArrowDataSource.footerOpens.get == before,
      "execution re-opened footers for planning metadata")
  }

  test("appends merge into the sidecar; a second generation with a " +
      "new column still resolves (mergeSchema) without footer opens") {
    val dir = Files.createTempDirectory("fidx_merge").toString
    writeFixture(dir)
    spark.range(100, 150).selectExpr(
      "id AS k", "CAST(id AS DOUBLE) AS v",
      "CONCAT('x', CAST(id AS STRING)) AS tag", "id * 2 AS extra")
      .coalesce(1)
      .write.format("arrow").mode("append").save(dir)
    val root = Paths.get(dir).toAbsolutePath.normalize
    val idx = FooterIndexFile.load(root).getOrElse(fail("sidecar gone"))
    val files = ArrowDataSource.visibleIpcFiles(dir)
    assert(files.forall(f => idx.infoOf(
      root.relativize(f.toAbsolutePath.normalize).toString).isDefined),
      "append's files missing from the merged sidecar")
    assert(idx.schemas.length == 2, "schema evolution needs a second " +
      s"generation, got ${idx.schemas.length}")
    val before = ArrowDataSource.footerOpens.get
    val df = spark.read.format("arrow")
      .option("mergeSchema", "true").load(dir)
    assert(df.columns.contains("extra"))
    assert(df.count() == 4050)
    assert(ArrowDataSource.footerOpens.get == before,
      "mergeSchema inference swept footers despite full coverage")
  }

  test("overwrite REPLACES the sidecar (no entries outlive their " +
      "files) and deleting it falls back to the sweep, same results") {
    val dir = Files.createTempDirectory("fidx_fall").toString
    writeFixture(dir)
    writeFixture(dir) // second overwrite: fresh uuids, fresh sidecar
    val root = Paths.get(dir).toAbsolutePath.normalize
    val idx = FooterIndexFile.load(root).getOrElse(fail("sidecar gone"))
    val live = ArrowDataSource.visibleIpcFiles(dir)
      .map(f => root.relativize(f.toAbsolutePath.normalize).toString)
      .toSet
    assert(idx.entries.keySet == live,
      s"sidecar carries stale entries: ${idx.entries.keySet -- live}")
    val withIdx = spark.read.format("arrow").load(dir)
      .agg(sum(col("k")), count(lit(1))).collect()(0)
    Files.delete(root.resolve(FooterIndexFile.FileName))
    val before = ArrowDataSource.footerOpens.get
    val swept = spark.read.format("arrow").load(dir)
      .agg(sum(col("k")), count(lit(1))).collect()(0)
    assert(ArrowDataSource.footerOpens.get > before,
      "sweep fallback did not engage after sidecar removal")
    assert(withIdx == swept)
  }

  test("a partitioned write indexes files under their col=value " +
      "relpaths and partition-pruned planning opens no footers") {
    val dir = Files.createTempDirectory("fidx_part").toString
    spark.range(1000).selectExpr("id AS k", "id % 4 AS p")
      .repartition(2, col("p"))
      .write.format("arrow").partitionBy("p")
      .mode("overwrite").save(dir)
    val root = Paths.get(dir).toAbsolutePath.normalize
    val idx = FooterIndexFile.load(root).getOrElse(fail("no sidecar"))
    assert(idx.entries.keySet.forall(_.startsWith("p=")),
      s"expected partition-dir relpaths, got ${idx.entries.keySet}")
    val before = ArrowDataSource.footerOpens.get
    val n = spark.read.format("arrow").load(dir)
      .filter(col("p") === 2).count()
    assert(n == 250)
    assert(ArrowDataSource.footerOpens.get == before)
  }
}

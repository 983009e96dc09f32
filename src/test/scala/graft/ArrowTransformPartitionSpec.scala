package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.arrow.{ArrowDataSource, GraftCatalog, PartitionTransform}

/** Derived (hidden) time partitioning: `partitionTransform =
  * "days(ts) AS day"` routes rows into day directories computed from
  * the timestamp, the source column stays in the files, and the
  * derived dir column behaves as an ordinary partition column —
  * pruning, partition-scoped DML, metadata retention. */
class ArrowTransformPartitionSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSession.spark
    s.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    s
  }

  test("days() transform: dirs derive from the timestamp, the source " +
      "column stays, pruning and metadata retention DELETE work") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tpart").toString
    val base = java.time.Instant.parse("2026-03-10T00:00:00Z")
    (0 until 96).map { i =>
      (i.toLong, java.sql.Timestamp.from(base.plusSeconds(i * 3600L)),
        s"v$i")
    }.toDF("id", "ts", "tag")
      .write.format("arrow")
      .option("partitionTransform", "days(ts) AS day")
      .option("optimizeWrite", "true")
      .mode("overwrite").save(dir)

    // 96 hourly rows = 4 day directories, named by the DERIVED value
    val days = Option(new java.io.File(dir).listFiles()).get
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(days == Seq("day=2026-03-10", "day=2026-03-11",
      "day=2026-03-12", "day=2026-03-13"), s"got $days")

    val t = spark.read.format("arrow").load(dir)
    // the derived column reads back as a partition column AND the
    // source timestamp is still in the files
    assert(t.schema.fieldNames.toSet == Set("id", "ts", "tag", "day"))
    assert(t.count() == 96)
    assert(t.filter(col("day") === "2026-03-11").count() == 24)
    assert(t.filter(col("day") === "2026-03-11")
      .agg(min(col("id"))).collect()(0).getLong(0) == 24L)

    // planning-time pruning on the derived column
    val planned = t.filter(col("day") === "2026-03-12")
      .queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(!planned.contains("day=2026-03-10"),
      "derived-partition pruning lost")

    // metadata-only retention: ISO day strings compare chronologically
    ArrowDataSource.initTableLog(dir)
    val before = ArrowDataSource.listIpcFiles(dir).map(_.toString).toSet
    spark.sql(s"DELETE FROM graft.arrow.`$dir` WHERE day < '2026-03-12'")
    assert(spark.read.format("arrow").load(dir).count() == 48)
    assert(ArrowDataSource.listIpcFiles(dir).map(_.toString).toSet ==
      before, "retention DELETE moved data bytes — not metadata-only")
  }

  test("the STREAMING sink honors partitionTransform: epochs land in " +
      "derived day dirs with exactly-once visibility") {
    import spark.implicits._
    val src = Files.createTempDirectory("tpart_stream_src").toString
    val dst = Files.createTempDirectory("tpart_stream_dst").toString
    val ckpt = Files.createTempDirectory("tpart_stream_ck").toString
    val base = java.time.Instant.parse("2026-05-01T00:00:00Z")
    (0 until 48).map { i =>
      (i.toLong, java.sql.Timestamp.from(base.plusSeconds(i * 3600L)))
    }.toDF("id", "ts")
      .coalesce(1).write.format("arrow").mode("overwrite").save(src)
    val q = spark.readStream.format("arrow").load(src)
      .writeStream.format("arrow")
      .option("partitionTransform", "days(ts) AS day")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(dst)
    try q.processAllAvailable() finally q.stop()
    val days = Option(new java.io.File(dst).listFiles()).get
      .filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("day=")).sorted.toSeq
    assert(days == Seq("day=2026-05-01", "day=2026-05-02"), s"$days")
    val t = spark.read.format("arrow").load(dst)
    assert(t.count() == 48)
    assert(t.filter(col("day") === "2026-05-02").count() == 24)
  }

  test("transform kinds map instants correctly; misuse refuses") {
    import spark.implicits._
    val t = PartitionTransform.parse("months(ts) AS m")
    assert(t == PartitionTransform("months", "ts", "m"))
    intercept[IllegalArgumentException] {
      PartitionTransform.parse("weeks(ts) AS w")
    }
    val dir = Files.createTempDirectory("tpart_kinds").toString
    Seq(
      (1L, java.sql.Timestamp.from(
        java.time.Instant.parse("2025-12-31T23:30:00Z"))),
      (2L, java.sql.Timestamp.from(
        java.time.Instant.parse("2026-01-01T00:30:00Z"))))
      .toDF("id", "ts")
      .write.format("arrow")
      .option("partitionTransform", "hours(ts) AS h")
      .mode("overwrite").save(dir)
    val dirs = Option(new java.io.File(dir).listFiles()).get
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(dirs == Seq("h=2025-12-31-23", "h=2026-01-01-00"), s"$dirs")

    // conflicts refuse
    val err = intercept[Exception] {
      Seq((1L, java.sql.Timestamp.from(java.time.Instant.now())))
        .toDF("id", "ts")
        .write.format("arrow")
        .option("partitionTransform", "days(ts) AS d")
        .partitionBy("id")
        .mode("overwrite")
        .save(Files.createTempDirectory("tpart_bad").toString)
    }
    assert(Iterator.iterate(err: Throwable)(_.getCause)
      .takeWhile(_ != null).map(String.valueOf).mkString
      .contains("cannot combine"))
  }
}

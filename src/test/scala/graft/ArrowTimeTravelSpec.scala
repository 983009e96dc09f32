package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.arrow.{ArrowDataSource, GraftCatalog}

/** Epoch time travel over the Arrow streaming sink's commit log: the
  * per-epoch manifests (and the epoch-ATTRIBUTED snapshot lines that
  * replace them on compaction) are a version history of an append-only
  * directory, so `option("epochAsOf", e)` — or SQL
  * `VERSION AS OF e` through the graft catalog — re-reads exactly the
  * files epochs 0..e committed. The 100 TB use: reproduce last week's
  * training mixture byte-for-byte while the sink keeps appending. */
class ArrowTimeTravelSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSession.spark
    s.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    s
  }

  /** Land `df`'s rows in `dir` as one committed sink epoch. */
  private def addEpoch(dir: String, epoch: Long,
      df: org.apache.spark.sql.DataFrame): Unit = {
    val stage = Files.createTempDirectory("tt_stage").toString
    df.write.format("arrow").mode("overwrite").save(stage)
    val moved = ArrowDataSource.listIpcFiles(stage).zipWithIndex.map {
      case (f, i) =>
        val dest = Paths.get(dir, s"part-e$epoch-$i.arrow")
        Files.move(f, dest); dest.toString
    }
    ArrowDataSource.commitEpochManifest(dir, epoch, moved)
  }

  private def threeEpochDir(): (String, Seq[Long]) = {
    val dir = Files.createTempDirectory("tt_sink").toString
    val r = spark.range(30).toDF("id")
    addEpoch(dir, 0L, r.filter(col("id") < 10))
    addEpoch(dir, 1L, r.filter(col("id") >= 10 && col("id") < 20))
    addEpoch(dir, 2L, r.filter(col("id") >= 20))
    (dir, Seq(10L, 20L, 30L))
  }

  test("epochAsOf reads exactly the prefix of committed epochs") {
    val (dir, cum) = threeEpochDir()
    for (e <- 0 to 2) {
      val df = spark.read.format("arrow")
        .option("epochAsOf", e.toString).load(dir)
      assert(df.count() == cum(e), s"epoch $e")
      // the prefix is the EXACT row set, not just the right cardinality
      assert(df.agg(max(col("id"))).collect()(0).getLong(0) ==
        cum(e) - 1)
    }
    // no option = latest
    assert(spark.read.format("arrow").load(dir).count() == 30L)
  }

  test("SQL VERSION AS OF resolves through the graft catalog") {
    val (dir, cum) = threeEpochDir()
    val n = spark.sql(
      s"SELECT count(*) AS n FROM graft.arrow.`$dir` VERSION AS OF 1")
      .collect()(0).getLong(0)
    assert(n == cum(1))
    val bad = intercept[Exception] {
      spark.sql(
        s"SELECT * FROM graft.arrow.`$dir` VERSION AS OF 'tuesday'")
        .collect()
    }
    assert(bad.getMessage != null)
  }

  test("time travel survives manifest compaction (epoch attribution)") {
    val dir = Files.createTempDirectory("tt_compact").toString
    // 25 epochs at the default interval 10 => snapshot at 19 + tail;
    // raw placeholder files suffice for a LISTING-level check
    val files = (0 until 25).map { e =>
      val f = Paths.get(dir, f"part-$e%05d.arrow")
      Files.write(f, Array[Byte](e.toByte))
      ArrowDataSource.commitEpochManifest(dir, e.toLong, Seq(f.toString))
      f
    }
    // epoch 13 sits INSIDE the snapshot: attribution must survive
    assert(ArrowDataSource.visibleIpcFiles(dir, Some(13L))
      .map(_.toString).sorted == files.take(14).map(_.toString).sorted)
    // tail epoch
    assert(ArrowDataSource.visibleIpcFiles(dir, Some(22L)).length == 23)
    // future epoch = everything
    assert(ArrowDataSource.visibleIpcFiles(dir, Some(99L)).length == 25)
  }

  test("a flat directory refuses epochAsOf") {
    val dir = Files.createTempDirectory("tt_flat").toString
    spark.range(5).toDF("id")
      .write.format("arrow").mode("overwrite").save(dir)
    val e = intercept[Exception] {
      spark.read.format("arrow").option("epochAsOf", "0").load(dir)
        .collect()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e).exists(_.contains("commit log")),
      s"unexpected error: $e")
  }

  test("pruning and pushdown still apply under time travel") {
    val (dir, _) = threeEpochDir()
    val df = spark.read.format("arrow")
      .option("epochAsOf", "1").load(dir)
      .filter(col("id") >= 5)
    assert(df.count() == 15L)
    assert(df.agg(sum(col("id"))).collect()(0).getLong(0) ==
      (5L until 20L).sum)
  }
}

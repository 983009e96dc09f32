package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.arrow.{ArrowDataSource, GraftCatalog}

/** Write-side schema merge (`option("mergeSchema", true)` on the arrow
  * writer — Delta's ergonomic append path): a drifted append
  * auto-evolves the DECLARED schema under the same invariants as
  * `CALL graft.system.add_column` instead of requiring the procedure
  * up front. The ledgers stay authoritative: dropped/renamed names
  * refuse to resurrect, type conflicts never merge, and the streaming
  * sink refuses the option outright. */
class ArrowMergeWriteSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSession.spark
    s.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    s
  }

  private def errChain(t: Throwable): Seq[Throwable] =
    Option(t).toSeq.flatMap(x => x +: errChain(x.getCause))
  private def assertRefused(e: Throwable, needle: String): Unit =
    assert(errChain(e).exists(t => Option(t.getMessage)
      .exists(_.contains(needle))), s"expected '$needle' in: $e")

  test("a drifted append with mergeSchema auto-evolves the declared " +
      "schema: old files serve nulls, new rows carry values, nothing " +
      "is rewritten") {
    import spark.implicits._
    val dir = Files.createTempDirectory("mergewrite").toString
    (1L to 30L).map(i => (i, i * 2L)).toDF("id", "amt")
      .repartition(2)
      .write.format("arrow").mode("overwrite").save(dir)
    ArrowDataSource.initTableLog(dir)
    val before = ArrowDataSource.listIpcFiles(dir)
      .map(f => f.toString -> Files.getLastModifiedTime(f)).toMap

    (31L to 35L).map(i => (i, i * 2L, s"n$i")).toDF("id", "amt", "note")
      .write.format("arrow").mode("append")
      .option("mergeSchema", "true").save(dir)

    // evolution is metadata + the appended file — no prior file moves
    val after = ArrowDataSource.listIpcFiles(dir)
      .map(f => f.toString -> Files.getLastModifiedTime(f)).toMap
    assert(before.forall { case (k, v) => after.get(k).contains(v) },
      "mergeSchema append must not rewrite pre-existing files")

    val df = spark.read.format("arrow").load(dir)
    assert(df.schema.fieldNames.toSeq == Seq("id", "amt", "note"))
    assert(df.count() == 35)
    assert(df.filter(col("note").isNull).count() == 30)
    assert(df.filter(col("note") === "n33").select("id")
      .head.getLong(0) == 33L)

    // the evolved declaration behaves exactly like add_column's:
    // catalog writes carry the column, DML can materialize it
    spark.sql(s"INSERT INTO graft.arrow.`$dir` VALUES (100, 7, NULL)")
    spark.sql(s"UPDATE graft.arrow.`$dir` SET note = 'old' WHERE id <= 3")
    val evolved = spark.read.format("arrow").load(dir)
    assert(evolved.count() == 36)
    assert(evolved.filter(col("note") === "old").count() == 3)

    // a merge append carrying ONLY known columns is a plain append
    // (missing declared columns read as nulls on its rows)
    Seq((101L, 1L), (102L, 2L)).toDF("id", "amt")
      .write.format("arrow").mode("append")
      .option("mergeSchema", "true").save(dir)
    val sub = spark.read.format("arrow").load(dir)
      .filter(col("id") >= 101L)
    assert(sub.count() == 2 && sub.filter(col("note").isNull).count() == 2)
  }

  test("mergeSchema works on an UNDECLARED table by declaring the " +
      "footer union first, and a first write declares nothing") {
    import spark.implicits._
    val dir = Files.createTempDirectory("mergewrite_fresh").toString
    // first write into an empty directory: no declaration to merge
    (1L to 5L).map(i => (i, i)).toDF("id", "amt")
      .write.format("arrow").mode("overwrite")
      .option("mergeSchema", "true").save(dir)
    val root = java.nio.file.Paths.get(dir).toAbsolutePath.normalize
    assert(ArrowDataSource.declaredSchema(root).isEmpty,
      "a first write must not declare a schema")
    // drifted append on the flat (non-logged) table: PROMOTES it to a
    // logged table (the declaration sidecar needs the metadata dir)
    // and declares current-union + the new column, so PLAIN reads (no
    // mergeSchema read option) see the union
    (6L to 8L).map(i => (i, i, i * 10L)).toDF("id", "amt", "extra")
      .write.format("arrow").mode("append")
      .option("mergeSchema", "true").save(dir)
    assert(ArrowDataSource.declaredSchema(root).isDefined)
    assert(ArrowDataSource.isTableLog(dir),
      "evolving a bare directory must promote it to a logged table")
    val df = spark.read.format("arrow").load(dir)
    assert(df.schema.fieldNames.toSeq == Seq("id", "amt", "extra"))
    assert(df.count() == 8 && df.filter(col("extra").isNull).count() == 5)
    // and the promoted table keeps accepting plain appends
    Seq((9L, 9L, 90L)).toDF("id", "amt", "extra")
      .write.format("arrow").mode("append").save(dir)
    assert(spark.read.format("arrow").load(dir).count() == 9)
  }

  test("the ledgers hold: dropped and renamed names refuse to " +
      "resurrect through a mergeSchema append") {
    import spark.implicits._
    val dir = Files.createTempDirectory("mergewrite_ledger").toString
    (1L to 10L).map(i => (i, i * 2L, s"t$i")).toDF("id", "amt", "tag")
      .write.format("arrow").mode("overwrite").save(dir)
    ArrowDataSource.initTableLog(dir)
    spark.sql(s"CALL graft.system.drop_column(path => '$dir', " +
      "name => 'tag')").collect()
    val e1 = intercept[Exception] {
      Seq((11L, 22L, "zombie")).toDF("id", "amt", "tag")
        .write.format("arrow").mode("append")
        .option("mergeSchema", "true").save(dir)
    }
    assertRefused(e1, "DROPPED")
    spark.sql(s"CALL graft.system.rename_column(path => '$dir', " +
      "old_name => 'amt', new_name => 'amount')").collect()
    val e2 = intercept[Exception] {
      Seq((11L, 22L, 33L)).toDF("id", "amount", "amt")
        .write.format("arrow").mode("append")
        .option("mergeSchema", "true").save(dir)
    }
    assertRefused(e2, "RENAMED")
    // the refusals left no partial evolution behind
    assert(spark.read.format("arrow").load(dir)
      .schema.fieldNames.toSeq == Seq("id", "amount"))
  }

  test("a same-name type conflict never merges") {
    import spark.implicits._
    val dir = Files.createTempDirectory("mergewrite_type").toString
    (1L to 10L).map(i => (i, i * 2L)).toDF("id", "amt")
      .write.format("arrow").mode("overwrite").save(dir)
    ArrowDataSource.initTableLog(dir)
    val e = intercept[Exception] {
      Seq((11L, "not a long")).toDF("id", "amt")
        .write.format("arrow").mode("append")
        .option("mergeSchema", "true").save(dir)
    }
    assertRefused(e, "type conflicts do not merge")
    assert(spark.read.format("arrow").load(dir).count() == 10)
  }

  test("the streaming sink refuses mergeSchema") {
    import spark.implicits._
    val dir = Files.createTempDirectory("mergewrite_stream").toString
    val ckpt = Files.createTempDirectory("mergewrite_ckpt").toString
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)]
    input.addData((1L, 2L))
    val e = intercept[Exception] {
      val q = input.toDF().toDF("id", "amt").writeStream.format("arrow")
        .option("checkpointLocation", ckpt)
        .option("mergeSchema", "true")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(dir)
      try q.processAllAvailable() finally q.stop()
    }
    assertRefused(e, "batch-write option")
  }
}

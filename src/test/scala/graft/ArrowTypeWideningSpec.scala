package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.arrow.{ArrowDataSource, GraftCatalog}

/** Metadata-only TYPE WIDENING (Delta's type widening): `CALL
  * graft.system.widen_column` — or a mergeSchema append carrying a
  * wider frame — widens a column's declared type losslessly
  * (tinyint/smallint/int → bigint, float → double) with zero file
  * rewrites. Old files keep their narrow bytes and the reader upcasts
  * per file ([[graft.sources.arrow.UpcastVector]]); zone-map stats
  * (exact longs/doubles) and integral bloom hashing (width-agnostic
  * `longValue()`) stay valid, so data skipping keeps firing over the
  * narrow generations. */
class ArrowTypeWideningSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSession.spark
    s.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    s
  }

  import TestErrors.assertRefused

  test("widen_column int -> bigint: old files upcast in place, new " +
      "writes land wide, values past Int.MaxValue round-trip") {
    import spark.implicits._
    val dir = Files.createTempDirectory("widen").toString
    (1 to 30).map(i => (i, i * 2)).toDF("id", "amt")
      .repartition(2)
      .write.format("arrow").mode("overwrite").save(dir)
    ArrowDataSource.initTableLog(dir)
    val before = ArrowDataSource.listIpcFiles(dir)
      .map(f => f.toString -> Files.getLastModifiedTime(f)).toMap

    spark.sql(s"CALL graft.system.widen_column(path => '$dir', " +
      "name => 'amt', type => 'bigint')").collect()

    // metadata-only: no pre-existing file moved
    val after = ArrowDataSource.listIpcFiles(dir)
      .map(f => f.toString -> Files.getLastModifiedTime(f)).toMap
    assert(before.forall { case (k, v) => after.get(k).contains(v) },
      "widen_column must not rewrite a file")

    val df = spark.read.format("arrow").load(dir)
    assert(df.schema("amt").dataType == LongType)
    assert(df.agg(sum($"amt")).head.getLong(0) == (1 to 30).map(_ * 2L).sum)

    // a post-widen append carries values no int can hold
    val big = 3_000_000_000L
    Seq((31, big)).toDF("id", "amt")
      .write.format("arrow").mode("append").save(dir)
    val all = spark.read.format("arrow").load(dir)
    assert(all.count() == 31)
    assert(all.filter($"amt" === big).select($"id").head.getInt(0) == 31)
    // pushed point filter against a NARROW generation's value: zone
    // maps recorded the int stats as exact longs, so skipping stays
    // correct and the row still surfaces
    assert(all.filter($"amt" === 40L).select($"id").head.getInt(0) == 20)
  }

  test("a mergeSchema append carrying a WIDER frame widens the " +
      "declaration; a NARROWER frame is served by the wider " +
      "declaration with no evolution") {
    import spark.implicits._
    val dir = Files.createTempDirectory("widenmerge").toString
    (1 to 10).map(i => (i, i.toFloat / 2)).toDF("id", "score")
      .write.format("arrow").mode("overwrite").save(dir)
    ArrowDataSource.initTableLog(dir)

    Seq((11, 5.5d)).toDF("id", "score")
      .write.format("arrow").mode("append")
      .option("mergeSchema", "true").save(dir)
    val df = spark.read.format("arrow").load(dir)
    assert(df.schema("score").dataType == DoubleType)
    assert(df.count() == 11)
    // float bytes upcast exactly (0.5f -> 0.5d)
    assert(df.filter($"id" === 1).select($"score").head.getDouble(0) == 0.5d)

    // narrower incoming: declaration stays double, write proceeds
    Seq((12, 6.5f)).toDF("id", "score")
      .write.format("arrow").mode("append")
      .option("mergeSchema", "true").save(dir)
    val again = spark.read.format("arrow").load(dir)
    assert(again.schema("score").dataType == DoubleType)
    assert(again.filter($"id" === 12).select($"score")
      .head.getDouble(0) == 6.5d)
  }

  test("a narrower mergeSchema append onto an UNDECLARED directory " +
      "promotes it to a declared table so plain reads keep resolving") {
    import spark.implicits._
    val dir = Files.createTempDirectory("widenpromote").toString
    (1L to 10L).map(i => (i, i * 3L)).toDF("id", "amt")
      .write.format("arrow").mode("overwrite").save(dir)
    // no initTableLog: bare directory, schema lives in footers only
    Seq((11, 99)).toDF("id", "amt")
      .selectExpr("CAST(id AS bigint) AS id", "CAST(amt AS int) AS amt")
      .write.format("arrow").mode("append")
      .option("mergeSchema", "true").save(dir)
    // mixed-width footers now need a declaration — the merge must have
    // declared bigint, else this plain read fails the agreement sweep
    val df = spark.read.format("arrow").load(dir)
    assert(df.schema("amt").dataType == LongType)
    assert(df.agg(sum(col("amt"))).head.getLong(0) ==
      (1L to 10L).map(_ * 3L).sum + 99L)
  }

  test("dotted widen_column widens a struct LEAF; pre-widen files " +
      "upcast through the struct patch") {
    import spark.implicits._
    val dir = Files.createTempDirectory("widenleaf").toString
    (1 to 8).map(i => (i, (i * 10, s"s$i"))).toDF("id", "meta")
      .select(col("id"), col("meta._1").as("n"), col("meta._2").as("tag"))
      .select(col("id"), struct(col("n"), col("tag")).as("meta"))
      .write.format("arrow").mode("overwrite").save(dir)
    ArrowDataSource.initTableLog(dir)
    spark.sql(s"CALL graft.system.widen_column(path => '$dir', " +
      "name => 'meta.n', type => 'bigint')").collect()
    val df = spark.read.format("arrow").load(dir)
    assert(df.schema("meta").dataType.asInstanceOf[StructType]("n")
      .dataType == LongType)
    assert(df.agg(sum(col("meta.n"))).head.getLong(0) ==
      (1 to 8).map(_ * 10L).sum)
    // post-widen insert carries a value only the wide leaf can hold
    spark.sql(s"INSERT INTO graft.arrow.`$dir` " +
      "SELECT 9, named_struct('n', 9000000000, 'tag', 'big')")
    assert(spark.read.format("arrow").load(dir)
      .filter(col("meta.n") > Int.MaxValue.toLong)
      .select(col("id")).head.getInt(0) == 9)
  }

  test("widening composes with merge-on-read deletion vectors: a DV " +
      "DELETE masks rows of a narrow file whose survivors upcast") {
    import spark.implicits._
    val dir = Files.createTempDirectory("widendv").toString
    (1 to 20).map(i => (i, i * 3)).toDF("id", "amt")
      .repartition(2)
      .write.format("arrow").mode("overwrite").save(dir)
    ArrowDataSource.initTableLog(dir)
    spark.sql(s"CALL graft.system.set_dv(path => '$dir')").collect()
    spark.sql(s"CALL graft.system.widen_column(path => '$dir', " +
      "name => 'amt', type => 'bigint')").collect()
    val before = ArrowDataSource.listIpcFiles(dir)
      .map(f => f.toString -> Files.getLastModifiedTime(f)).toMap
    // MoR DELETE predicated through the upcast read; no file rewrites
    spark.sql(s"DELETE FROM graft.arrow.`$dir` WHERE amt <= 9")
    val after = ArrowDataSource.listIpcFiles(dir)
      .map(f => f.toString -> Files.getLastModifiedTime(f)).toMap
    assert(before.forall { case (k, v) => after.get(k).contains(v) },
      "a DV delete on a widened table must not rewrite files")
    val df = spark.read.format("arrow").load(dir)
    assert(df.count() == 17)
    assert(df.schema("amt").dataType == LongType)
    assert(df.agg(sum(col("amt"))).head.getLong(0) ==
      (4 to 20).map(_ * 3L).sum)
  }

  test("a STALE narrow read over files already written wide refuses " +
      "loudly instead of silently truncating") {
    import spark.implicits._
    val dir = Files.createTempDirectory("widenstale").toString
    Seq((1, 3_000_000_000L)).toDF("id", "amt")
      .write.format("arrow").mode("overwrite").save(dir)
    // a reader that planned before the widen carries the old INT view
    val stale = new StructType()
      .add("id", IntegerType).add("amt", IntegerType)
    val e = intercept[Exception] {
      spark.read.format("arrow").schema(stale).load(dir).collect()
    }
    assertRefused(e, "re-plan the read")
  }

  test("narrowing, lossy casts, partition columns and unknown " +
      "columns refuse") {
    import spark.implicits._
    val dir = Files.createTempDirectory("widenrefuse").toString
    (1 to 6).map(i => (i.toLong, i, s"c${i % 2}")).toDF("id", "amt", "c")
      .write.format("arrow").mode("overwrite")
      .partitionBy("c").save(dir)
    ArrowDataSource.initTableLog(dir)
    def call(name: String, tpe: String) =
      spark.sql(s"CALL graft.system.widen_column(path => '$dir', " +
        s"name => '$name', type => '$tpe')").collect()
    assertRefused(intercept[Exception](call("id", "int")),
      "does not widen")
    assertRefused(intercept[Exception](call("amt", "double")),
      "does not widen")
    assertRefused(intercept[Exception](call("amt", "string")),
      "does not widen")
    assertRefused(intercept[Exception](call("amt", "int")),
      "already int")
    assertRefused(intercept[Exception](call("c", "string")),
      "partition column")
    assertRefused(intercept[Exception](call("nope", "bigint")),
      "no column")
    // a true type CONFLICT on a mergeSchema write still refuses —
    // widening did not open the door to arbitrary deltas
    val e = intercept[Exception] {
      Seq((7L, "oops", "c1")).toDF("id", "amt", "c")
        .write.format("arrow").mode("append")
        .option("mergeSchema", "true").save(dir)
    }
    assertRefused(e, "type conflicts do not merge")
  }

  test("widening composes with the engine: DML, compaction " +
      "materializing wide, aggregate pushdown and sort stamps") {
    import spark.implicits._
    val dir = Files.createTempDirectory("widencompose").toString
    (1 to 40).map(i => (i, i * 5)).toDF("id", "amt")
      .repartition(4)
      .write.format("arrow").mode("overwrite").save(dir)
    ArrowDataSource.initTableLog(dir)
    spark.sql(s"CALL graft.system.widen_column(path => '$dir', " +
      "name => 'amt', type => 'bigint')").collect()
    // CoW UPDATE through the widened read path: predicate on narrow
    // bytes, materialized rows land at the declared wide type
    spark.sql(s"UPDATE graft.arrow.`$dir` SET amt = 7000000000 " +
      "WHERE id <= 3")
    val df = spark.read.format("arrow").load(dir)
    assert(df.filter(col("amt") === 7000000000L).count() == 3)
    assert(df.agg(sum(col("amt"))).head.getLong(0) ==
      (4 to 40).map(_ * 5L).sum + 3 * 7000000000L)
    // aggregate pushdown answers MIN/MAX from footer stats across
    // mixed-width generations at the declared type — and actually
    // PUSHES: zero data batches open (narrow files' stats are exact
    // longs, so widening does not poison the footer path)
    val loaded = ArrowDataSource.recordBatchesLoaded.get()
    val mm = df.agg(min(col("amt")), max(col("amt"))).head
    assert(mm.getLong(0) == 20L && mm.getLong(1) == 7000000000L)
    assert(ArrowDataSource.recordBatchesLoaded.get() == loaded,
      "MIN/MAX over a widened column must still answer from footers")
    // compaction reads through the upcast and rewrites WIDE footers
    spark.sql(s"CALL graft.system.compact(path => '$dir', " +
      "target_rows => 1000)").collect()
    val compacted = spark.read.format("arrow").load(dir)
    assert(compacted.count() == 40)
    assert(compacted.agg(sum(col("amt"))).head.getLong(0) ==
      (4 to 40).map(_ * 5L).sum + 3 * 7000000000L)
  }

  test("widen_column decimal(10,2) -> decimal(20,2): same scale, " +
      "grown precision — old files upcast in place, values past the " +
      "narrow capacity round-trip") {
    val dir = Files.createTempDirectory("widen_dec").toString
    spark.range(1, 31)
      .select(col("id").cast("int").as("id"),
        expr("CAST(id AS DECIMAL(10,2)) + 0.25").cast(DecimalType(10, 2))
          .as("amt"))
      .repartition(2)
      .write.format("arrow").mode("overwrite").save(dir)
    ArrowDataSource.initTableLog(dir)
    val before = ArrowDataSource.listIpcFiles(dir)
      .map(f => f.toString -> Files.getLastModifiedTime(f)).toMap

    spark.sql(s"CALL graft.system.widen_column(path => '$dir', " +
      "name => 'amt', type => 'decimal(20,2)')").collect()

    val after = ArrowDataSource.listIpcFiles(dir)
      .map(f => f.toString -> Files.getLastModifiedTime(f)).toMap
    assert(before.forall { case (k, v) => after.get(k).contains(v) },
      "decimal widen_column must not rewrite a file")

    val df = spark.read.format("arrow").load(dir)
    assert(df.schema("amt").dataType == DecimalType(20, 2))
    // digits unchanged through the upcast: exact decimal sum
    assert(df.agg(sum(col("amt"))).head.getDecimal(0) ==
      new java.math.BigDecimal("472.50"))

    // a post-widen append carries a value decimal(10,2) cannot hold
    val big = new java.math.BigDecimal("99999999999999.25")
    spark.range(31, 32)
      .select(col("id").cast("int").as("id"),
        lit(big).cast(DecimalType(20, 2)).as("amt"))
      .write.format("arrow").mode("append").save(dir)
    val all = spark.read.format("arrow").load(dir)
    assert(all.count() == 31)
    assert(all.filter(col("amt") === lit(big)).select(col("id"))
      .head.getInt(0) == 31)
    // CoW UPDATE reads narrow decimal bytes through the upcast and
    // materializes replacement rows at the declared wide type
    spark.sql(s"UPDATE graft.arrow.`$dir` SET amt = 0.00 " +
      "WHERE id <= 3")
    val upd = spark.read.format("arrow").load(dir)
    val expected = (4 to 30).map(i => BigDecimal(i) + BigDecimal("0.25"))
      .sum + BigDecimal(big)
    assert(BigDecimal(upd.agg(sum(col("amt"))).head.getDecimal(0))
      == expected)
  }

  test("decimal widening refuses re-scaling and narrowing") {
    val dir = Files.createTempDirectory("widen_dec_refuse").toString
    spark.range(1, 11)
      .select(col("id").cast("int").as("id"),
        expr("CAST(id AS DECIMAL(10,2))").as("amt"))
      .write.format("arrow").mode("overwrite").save(dir)
    ArrowDataSource.initTableLog(dir)
    def call(tpe: String) =
      spark.sql(s"CALL graft.system.widen_column(path => '$dir', " +
        s"name => 'amt', type => '$tpe')").collect()
    // scale change moves digits — a rewrite, never metadata-only
    assertRefused(intercept[Exception](call("decimal(20,4)")),
      "does not widen")
    // narrowing loses digits
    assertRefused(intercept[Exception](call("decimal(8,2)")),
      "does not widen")
  }

  test("a mergeSchema append carrying a WIDER decimal frame widens " +
      "the declaration; mixed generations read at the union type") {
    val dir = Files.createTempDirectory("widen_dec_merge").toString
    spark.range(1, 11)
      .select(col("id").cast("int").as("id"),
        expr("CAST(id AS DECIMAL(10,2))").as("amt"))
      .write.format("arrow").mode("overwrite").save(dir)
    ArrowDataSource.initTableLog(dir)
    spark.range(11, 13)
      .select(col("id").cast("int").as("id"),
        expr("CAST(20000000000.50 AS DECIMAL(20,2))").as("amt"))
      .write.format("arrow").mode("append")
      .option("mergeSchema", "true").save(dir)
    val df = spark.read.format("arrow").load(dir)
    assert(df.schema("amt").dataType == DecimalType(20, 2))
    assert(df.count() == 12)
    assert(BigDecimal(df.agg(sum(col("amt"))).head.getDecimal(0)) ==
      (1 to 10).map(BigDecimal(_)).sum + BigDecimal("40000000001.00"))
  }
}

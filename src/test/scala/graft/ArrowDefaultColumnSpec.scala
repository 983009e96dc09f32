package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.arrow.{ArrowDataSource, GraftCatalog}

/** INITIAL DEFAULTS (Iceberg's initial-default): `CALL
  * graft.system.add_column(path, name, type, default)` declares a SQL
  * literal served in place of NULL for every file whose footer LACKS
  * the column — history gets a value without a backfill rewrite.
  * Presence in the footer decides: a post-declaration file that stores
  * an explicit NULL serves NULL. The default lives in the `_schema`
  * ledger (`default` lines), follows its column through RENAME, dies
  * with DROP, and re-casts losslessly under widen_column. */
class ArrowDefaultColumnSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSession.spark
    s.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    s
  }

  import TestErrors.assertRefused

  test("files predating the column serve the default; files that " +
      "store the column serve their bytes (including explicit NULL)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("defcol").toString
    (1L to 20L).map(i => (i, i * 2L)).toDF("id", "amt")
      .repartition(2)
      .write.format("arrow").mode("overwrite").save(dir)
    ArrowDataSource.initTableLog(dir)
    spark.sql(s"CALL graft.system.add_column(path => '$dir', " +
      "name => 'channel', type => 'string', default => \"'legacy'\")")
      .collect()
    // no file rewritten, but history reads 'legacy'
    val df = spark.read.format("arrow").load(dir)
    assert(df.filter(col("channel") === "legacy").count() == 20)
    assert(df.filter(col("channel").isNull).count() == 0)
    // post-declaration rows: explicit value and explicit NULL both win
    spark.sql(s"INSERT INTO graft.arrow.`$dir` VALUES " +
      "(21, 42, 'api'), (22, 44, NULL)")
    val all = spark.read.format("arrow").load(dir)
    assert(all.filter(col("channel") === "api").count() == 1)
    assert(all.filter(col("channel").isNull)
      .select(col("id")).head.getLong(0) == 22L)
    assert(all.filter(col("channel") === "legacy").count() == 20)
    // aggregation mixes generations correctly
    assert(all.groupBy(col("channel")).count().count() == 3)
  }

  test("numeric defaults: filters and aggregates over mixed " +
      "generations, DML predicated on the default value") {
    import spark.implicits._
    val dir = Files.createTempDirectory("defnum").toString
    (1L to 12L).map(i => (i, s"d$i")).toDF("id", "name")
      .repartition(2)
      .write.format("arrow").mode("overwrite").save(dir)
    ArrowDataSource.initTableLog(dir)
    spark.sql(s"CALL graft.system.add_column(path => '$dir', " +
      "name => 'score', type => 'bigint', default => '100')").collect()
    spark.sql(s"INSERT INTO graft.arrow.`$dir` VALUES (13, 'd13', 7)")
    val df = spark.read.format("arrow").load(dir)
    assert(df.agg(sum(col("score"))).head.getLong(0) == 12 * 100L + 7L)
    assert(df.filter(col("score") === 100L).count() == 12)
    assert(df.agg(min(col("score")), max(col("score")))
      .head match { case r => r.getLong(0) == 7L && r.getLong(1) == 100L })
    // a CoW UPDATE keyed on the DEFAULT picks up pre-declaration rows
    spark.sql(s"UPDATE graft.arrow.`$dir` SET score = 200 " +
      "WHERE score = 100 AND id <= 3")
    val upd = spark.read.format("arrow").load(dir)
    assert(upd.filter(col("score") === 200L).count() == 3)
    assert(upd.filter(col("score") === 100L).count() == 9)
  }

  test("the default follows RENAME, re-casts under widen_column, " +
      "and dies with DROP") {
    import spark.implicits._
    val dir = Files.createTempDirectory("defevo").toString
    (1L to 6L).map(i => (i, i)).toDF("id", "v")
      .write.format("arrow").mode("overwrite").save(dir)
    ArrowDataSource.initTableLog(dir)
    spark.sql(s"CALL graft.system.add_column(path => '$dir', " +
      "name => 'tier', type => 'int', default => '3')").collect()
    spark.sql(s"CALL graft.system.rename_column(path => '$dir', " +
      "old_name => 'tier', new_name => 'level')").collect()
    val renamed = spark.read.format("arrow").load(dir)
    assert(renamed.filter(col("level") === 3).count() == 6)
    spark.sql(s"CALL graft.system.widen_column(path => '$dir', " +
      "name => 'level', type => 'bigint')").collect()
    val widened = spark.read.format("arrow").load(dir)
    assert(widened.schema("level").dataType == LongType)
    assert(widened.agg(sum(col("level"))).head.getLong(0) == 18L)
    spark.sql(s"CALL graft.system.drop_column(path => '$dir', " +
      "name => 'level')").collect()
    val root = java.nio.file.Paths.get(dir).toAbsolutePath.normalize
    assert(ArrowDataSource.defaultColumns(root).isEmpty,
      "a dropped column's default must leave the ledger")
  }

  test("a later mergeSchema append preserves the defaults ledger") {
    import spark.implicits._
    val dir = Files.createTempDirectory("defmerge").toString
    (1L to 5L).map(i => (i, i)).toDF("id", "v")
      .write.format("arrow").mode("overwrite").save(dir)
    ArrowDataSource.initTableLog(dir)
    spark.sql(s"CALL graft.system.add_column(path => '$dir', " +
      "name => 'src', type => 'string', default => \"'seed'\")")
      .collect()
    Seq((6L, 7L, "x", "drifted")).toDF("id", "v", "src", "extra")
      .write.format("arrow").mode("append")
      .option("mergeSchema", "true").save(dir)
    val df = spark.read.format("arrow").load(dir)
    assert(df.filter(col("src") === "seed").count() == 5)
    assert(df.filter(col("extra").isNull).count() == 5)
    assert(df.filter(col("src") === "x").select(col("extra"))
      .head.getString(0) == "drifted")
  }

  test("the change feed serves defaults too: a pre-declaration file's " +
      "rows surface with the default, not null, in CDF reads") {
    import spark.implicits._
    val dir = Files.createTempDirectory("defcdf").toString
    (1L to 8L).map(i => (i, i)).toDF("id", "v")
      .write.format("arrow").mode("overwrite").save(dir)
    ArrowDataSource.initTableLog(dir)
    spark.sql(s"CALL graft.system.add_column(path => '$dir', " +
      "name => 'tag', type => 'string', default => \"'old'\")").collect()
    // a delete touches pre-declaration rows; the CDF delete diff must
    // carry the DEFAULT (the same reader serves the removed rows)
    spark.sql(s"DELETE FROM graft.arrow.`$dir` WHERE id <= 2")
    val changes = spark.read.format("arrow")
      .option("readChangeFeed", "true").option("startingEpoch", 0L)
      .load(dir)
    val deleted = changes.filter(col("_change_type") === "delete")
    assert(deleted.count() == 2)
    assert(deleted.filter(col("tag") === "old").count() == 2,
      "CDF delete rows must serve the declared default")
  }

  test("widening a FLOAT column re-literalizes its default: history " +
      "keeps serving the float's exact value, not a re-read of the " +
      "original text at double precision") {
    import spark.implicits._
    val dir = Files.createTempDirectory("defwidenfloat").toString
    (1L to 5L).map(i => (i, i)).toDF("id", "v")
      .write.format("arrow").mode("overwrite").save(dir)
    ArrowDataSource.initTableLog(dir)
    spark.sql(s"CALL graft.system.add_column(path => '$dir', " +
      "name => 'score', type => 'float', default => '0.1')").collect()
    val asFloat = spark.read.format("arrow").load(dir)
      .select(col("score")).head.getFloat(0)
    assert(asFloat == 0.1f)
    spark.sql(s"CALL graft.system.widen_column(path => '$dir', " +
      "name => 'score', type => 'double')").collect()
    val served = spark.read.format("arrow").load(dir)
      .select(col("score")).head.getDouble(0)
    // 0.1f as a double is 0.100000001490116...; re-reading the TEXT
    // '0.1' at double would flip history to 0.1d — a silent value
    // change across a "lossless" metadata op
    assert(served == 0.1f.toDouble,
      s"default drifted: served $served, want ${0.1f.toDouble}")
    assert(served != 0.1d)
  }

  test("every servable default type round-trips: boolean, double, " +
      "date, timestamp") {
    import spark.implicits._
    val dir = Files.createTempDirectory("deftypes").toString
    (1L to 4L).map(i => (i, i)).toDF("id", "v")
      .write.format("arrow").mode("overwrite").save(dir)
    ArrowDataSource.initTableLog(dir)
    def add(name: String, tpe: String, dflt: String) =
      spark.sql(s"CALL graft.system.add_column(path => '$dir', " +
        s"name => '$name', type => '$tpe', default => $dflt)").collect()
    // the param value is SQL-expression TEXT (what evalDefault parses)
    add("flag", "boolean", "'true'")
    add("score", "double", "'0.25'")
    add("d", "date", "\"'2024-03-01'\"")
    add("t", "timestamp", "\"'2024-03-01 12:30:00'\"")
    val r = spark.read.format("arrow").load(dir)
      .select(col("flag"), col("score"), col("d"), col("t")).head
    assert(r.getBoolean(0))
    assert(r.getDouble(1) == 0.25)
    assert(r.getDate(2).toString == "2024-03-01")
    assert(r.getTimestamp(3).toInstant ==
      java.time.Instant.parse("2024-03-01T12:30:00Z"))
  }

  test("refusals: struct leaves, non-literals, unsupported types, " +
      "uncastable literals, line breaks") {
    import spark.implicits._
    val dir = Files.createTempDirectory("defrefuse").toString
    (1L to 4L).map(i => (i, (i, s"t$i"))).toDF("id", "meta")
      .write.format("arrow").mode("overwrite").save(dir)
    ArrowDataSource.initTableLog(dir)
    def call(name: String, tpe: String, dflt: String) =
      spark.sql(s"CALL graft.system.add_column(path => '$dir', " +
        s"name => '$name', type => '$tpe', default => $dflt)").collect()
    assertRefused(intercept[Exception](
      call("meta.flag", "string", "'x'")), "struct LEAF")
    assertRefused(intercept[Exception](
      call("tags", "array<string>", "'x'")), "primitive types only")
    assertRefused(intercept[Exception](
      call("n", "bigint", "'not-a-number'")), "")
    // NaN/Infinity refuse: their decimal renderings would not
    // re-parse after a widen_column re-literalization
    assertRefused(intercept[Exception](
      call("nanc", "float", "\"CAST('NaN' AS FLOAT)\"")), "finite")
    assertRefused(intercept[Exception](
      call("infc", "double", "\"CAST('Infinity' AS DOUBLE)\"")), "finite")
    assertRefused(intercept[Exception](
      call("m", "bigint", "'1\n2'")), "")
    // none of the refusals half-declared anything
    val root = java.nio.file.Paths.get(dir).toAbsolutePath.normalize
    assert(ArrowDataSource.defaultColumns(root).isEmpty)
    assert(spark.read.format("arrow").load(dir)
      .schema.fieldNames.toSeq == Seq("id", "meta"))
  }
}

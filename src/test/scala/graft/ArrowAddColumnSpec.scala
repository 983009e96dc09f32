package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.arrow.{ArrowDataSource, GraftCatalog}

/** Metadata-only ADD COLUMN (`CALL graft.system.add_column`): the
  * declared schema evolves without touching a file; old files serve
  * the new column as nulls, new writes carry it, DML materializes it,
  * and writer drift against the declaration fails loudly. */
class ArrowAddColumnSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSession.spark
    s.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    s
  }

  import TestErrors.assertRefused

  test("add_column evolves reads, writes, and DML without a rewrite") {
    import spark.implicits._
    val dir = Files.createTempDirectory("addcol").toString
    (1L to 50L).map(i => (i, i * 3L)).toDF("id", "amt")
      .repartition(2)
      .write.format("arrow").mode("overwrite").save(dir)
    ArrowDataSource.initTableLog(dir)
    val filesBefore = ArrowDataSource.listIpcFiles(dir)
      .map(f => f.toString -> Files.getLastModifiedTime(f)).toMap

    val n = spark.sql(s"CALL graft.system.add_column(path => '$dir', " +
      "name => 'note', type => 'string')").collect().head.getLong(0)
    assert(n == 3L)
    // metadata-only: no data file touched
    assert(ArrowDataSource.listIpcFiles(dir)
      .map(f => f.toString -> Files.getLastModifiedTime(f)).toMap ==
      filesBefore)
    // old files serve the new column as nulls
    val df = spark.read.format("arrow").load(dir)
    assert(df.schema.fieldNames.toSeq == Seq("id", "amt", "note"))
    assert(df.filter(col("note").isNull).count() == 50)

    // new writes carry it; mixed read resolves per file by name
    spark.sql(s"INSERT INTO graft.arrow.`$dir` VALUES " +
      "(100, 7, 'fresh'), (101, 9, NULL)")
    val mixed = spark.read.format("arrow").load(dir)
    assert(mixed.count() == 52)
    assert(mixed.filter(col("note") === "fresh").select("id")
      .collect().map(_.getLong(0)).toSeq == Seq(100L))
    // filters on the evolved column stay correct over old files
    assert(mixed.filter(col("note").isNull).count() == 51)

    // DML materializes the column through copy-on-write
    spark.sql(s"UPDATE graft.arrow.`$dir` SET note = 'flagged' " +
      "WHERE id <= 5")
    val upd = spark.read.format("arrow").load(dir)
    assert(upd.filter(col("note") === "flagged").count() == 5)
    assert(upd.filter(col("note").isNull).count() == 46)

    // aggregates over the evolved column answer correctly (pushdown
    // refuses conservatively where footers lack its stats)
    val agg = upd.agg(count(col("note")), min(col("note"))).collect().head
    assert(agg.getLong(0) == 6L && agg.getString(1) == "flagged")

    // duplicate refuses
    val e = intercept[Exception] {
      spark.sql(s"CALL graft.system.add_column(path => '$dir', " +
        "name => 'note', type => 'string')").collect()
    }
    assert(e.getMessage.contains("already exists"))

    // a second evolution stacks on the declaration
    spark.sql(s"CALL graft.system.add_column(path => '$dir', " +
      "name => 'score', type => 'double')").collect()
    assert(spark.read.format("arrow").load(dir).schema.fieldNames.toSeq ==
      Seq("id", "amt", "note", "score"))
  }

  test("drop_column hides history without a rewrite and the name " +
      "cannot resurrect") {
    import spark.implicits._
    val dir = Files.createTempDirectory("dropcol").toString
    (1L to 20L).map(i => (i, i * 2L, s"t$i")).toDF("id", "amt", "tag")
      .repartition(2)
      .write.format("arrow").mode("overwrite").save(dir)
    ArrowDataSource.initTableLog(dir)
    val filesBefore = ArrowDataSource.listIpcFiles(dir)
      .map(f => f.toString -> Files.getLastModifiedTime(f)).toMap
    spark.sql(s"CALL graft.system.drop_column(path => '$dir', " +
      "name => 'tag')").collect()
    assert(ArrowDataSource.listIpcFiles(dir)
      .map(f => f.toString -> Files.getLastModifiedTime(f)).toMap ==
      filesBefore, "drop_column must not touch data files")
    val df = spark.read.format("arrow").load(dir)
    assert(df.schema.fieldNames.toSeq == Seq("id", "amt"))
    assert(df.count() == 20)
    // writes to the shrunk schema work; the old files' extra column
    // passes the sweep via the dropped ledger
    spark.sql(s"INSERT INTO graft.arrow.`$dir` VALUES (100, 7)")
    assert(spark.read.format("arrow").load(dir).count() == 21)
    // resurrection refused
    val e = intercept[Exception] {
      spark.sql(s"CALL graft.system.add_column(path => '$dir', " +
        "name => 'tag', type => 'string')").collect()
    }
    assert(e.getMessage.contains("DROPPED"))
    // a fresh name is fine
    spark.sql(s"CALL graft.system.add_column(path => '$dir', " +
      "name => 'tag2', type => 'string')").collect()
    assert(spark.read.format("arrow").load(dir).schema.fieldNames.toSeq ==
      Seq("id", "amt", "tag2"))
  }

  test("rename_column serves old data under the new name, survives a " +
      "rename chain with mid-chain writes, and blocks resurrection") {
    import spark.implicits._
    val dir = Files.createTempDirectory("renamecol").toString
    (1L to 30L).map(i => (i, i * 5L)).toDF("id", "v1")
      .repartition(2)
      .write.format("arrow").mode("overwrite").save(dir)
    ArrowDataSource.initTableLog(dir)
    val filesBefore = ArrowDataSource.listIpcFiles(dir)
      .map(f => f.toString -> Files.getLastModifiedTime(f)).toMap
    spark.sql(s"CALL graft.system.rename_column(path => '$dir', " +
      "old_name => 'v1', new_name => 'v2')").collect()
    assert(ArrowDataSource.listIpcFiles(dir)
      .map(f => f.toString -> Files.getLastModifiedTime(f)).toMap ==
      filesBefore, "rename_column must not touch data files")
    val df = spark.read.format("arrow").load(dir)
    assert(df.schema.fieldNames.toSeq == Seq("id", "v2"))
    // old files' v1 bytes serve under v2
    assert(df.agg(sum(col("v2"))).head.getLong(0) ==
      (1L to 30L).map(_ * 5L).sum)
    assert(df.filter(col("v2") === 25L).select("id")
      .collect().map(_.getLong(0)).toSeq == Seq(5L))
    // mid-chain write carries the then-current logical name v2
    spark.sql(s"INSERT INTO graft.arrow.`$dir` VALUES (100, 999)")
    // second rename: v2 -> v3; files now carry v1 (oldest) AND v2
    spark.sql(s"CALL graft.system.rename_column(path => '$dir', " +
      "old_name => 'v2', new_name => 'v3')").collect()
    val chained = spark.read.format("arrow").load(dir)
    assert(chained.schema.fieldNames.toSeq == Seq("id", "v3"))
    assert(chained.agg(sum(col("v3"))).head.getLong(0) ==
      (1L to 30L).map(_ * 5L).sum + 999L)
    // DML through the renamed schema: CoW materializes v3
    spark.sql(s"UPDATE graft.arrow.`$dir` SET v3 = 0 WHERE id <= 10")
    val upd = spark.read.format("arrow").load(dir)
    assert(upd.agg(sum(col("v3"))).head.getLong(0) ==
      (11L to 30L).map(_ * 5L).sum + 999L)
    // TIME TRAVEL across the evolution: a pre-rename epoch reads under
    // the CURRENT logical schema (schema is table metadata, not
    // versioned state) with values served through the alias
    val old = spark.read.format("arrow")
      .option("epochAsOf", "0").load(dir)
    assert(old.schema.fieldNames.toSeq == Seq("id", "v3"))
    assert(old.count() == 30 &&
      old.agg(sum(col("v3"))).head.getLong(0) == (1L to 30L).map(_ * 5L).sum)
    // neither historical name can come back
    for (dead <- Seq("v1", "v2")) {
      val e = intercept[Exception] {
        spark.sql(s"CALL graft.system.add_column(path => '$dir', " +
          s"name => '$dead', type => 'bigint')").collect()
      }
      assert(e.getMessage.contains("RENAMED") ||
        e.getMessage.contains("DROPPED"), e.getMessage)
    }
    intercept[Exception] {
      spark.sql(s"CALL graft.system.rename_column(path => '$dir', " +
        "old_name => 'id', new_name => 'v1')").collect()
    }
  }

  test("DML predicates on a RENAMED column resolve over pre-rename " +
      "files (triage stays conservative, rewrite reads through the " +
      "alias)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("renamedml").toString
    (1L to 40L).map(i => (i, i * 2L)).toDF("id", "v1")
      .repartition(2)
      .write.format("arrow").mode("overwrite").save(dir)
    ArrowDataSource.initTableLog(dir)
    spark.sql(s"CALL graft.system.rename_column(path => '$dir', " +
      "old_name => 'v1', new_name => 'v2')").collect()
    // DELETE keyed on the renamed column: rows live only in old files
    spark.sql(s"DELETE FROM graft.arrow.`$dir` WHERE v2 <= 20")
    val df = spark.read.format("arrow").load(dir)
    assert(df.count() == 30, s"wrong survivor count: ${df.count()}")
    assert(df.agg(min(col("v2"))).head.getLong(0) == 22L)
    // UPDATE with a renamed-column predicate AND assignment
    spark.sql(s"UPDATE graft.arrow.`$dir` SET v2 = 0 WHERE v2 >= 70")
    val upd = spark.read.format("arrow").load(dir)
    assert(upd.filter(col("v2") === 0L).count() == 6)
    assert(upd.agg(sum(col("v2"))).head.getLong(0) ==
      (22L to 68L by 2).sum)
    // MERGE keyed on id but updating the renamed measure
    Seq((25L, 999L)).toDF("mid", "mv")
      .createOrReplaceTempView("rename_merge_src")
    spark.sql(s"MERGE INTO graft.arrow.`$dir` t " +
      "USING rename_merge_src s ON t.id = s.mid " +
      "WHEN MATCHED THEN UPDATE SET v2 = s.mv")
    assert(spark.read.format("arrow").load(dir)
      .filter(col("id") === 25L).head.getLong(1) == 999L)
    // and the DELETION-VECTOR path: a MoR delete keyed on the renamed
    // column must mask the right ordinals of pre-rename files
    spark.sql(s"CALL graft.system.set_dv(path => '$dir')").collect()
    spark.sql(s"DELETE FROM graft.arrow.`$dir` WHERE v2 = 999")
    val dv = spark.read.format("arrow").load(dir)
    assert(dv.filter(col("id") === 25L).count() == 0)
    assert(dv.count() == 29)
  }

  test("maintenance rewrites (compact, zorder) of an evolved table " +
      "write logical-schema files and preserve every row") {
    import spark.implicits._
    val dir = Files.createTempDirectory("evo_maint").toString
    (1L to 60L).map(i => (i, i * 3L)).toDF("id", "v1")
      .repartition(6) // many small files for compact to fold
      .write.format("arrow").mode("overwrite").save(dir)
    ArrowDataSource.initTableLog(dir)
    spark.sql(s"CALL graft.system.rename_column(path => '$dir', " +
      "old_name => 'v1', new_name => 'v2')").collect()
    spark.sql(s"CALL graft.system.add_column(path => '$dir', " +
      "name => 'note', type => 'string')").collect()
    spark.sql(s"INSERT INTO graft.arrow.`$dir` VALUES (100, 1, 'z')")
    def state() = spark.read.format("arrow").load(dir)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1),
        if (r.isNullAt(2)) null else r.getString(2))).toSet
    val before = state()
    spark.sql(s"CALL graft.system.compact(path => '$dir', " +
      "target_rows => 1000)").collect()
    assert(state() == before, "compact changed the evolved table's rows")
    // the compacted files carry the LOGICAL schema: a fresh read
    // without the ledger-era files must still see v2/note
    assert(spark.read.format("arrow").load(dir)
      .schema.fieldNames.toSeq == Seq("id", "v2", "note"))
    spark.sql(s"CALL graft.system.zorder(path => '$dir', " +
      "cols => 'id,v2')").collect()
    assert(state() == before, "zorder changed the evolved table's rows")
  }

  test("the change feed serves an evolved table under logical names") {
    import spark.implicits._
    val dir = Files.createTempDirectory("evo_cdf").toString
    (1L to 20L).map(i => (i, i * 4L)).toDF("id", "v1")
      .repartition(2)
      .write.format("arrow").mode("overwrite").save(dir)
    ArrowDataSource.initTableLog(dir)
    spark.sql(s"CALL graft.system.rename_column(path => '$dir', " +
      "old_name => 'v1', new_name => 'v2')").collect()
    spark.sql(s"CALL graft.system.add_column(path => '$dir', " +
      "name => 'note', type => 'string')").collect()
    spark.sql(s"DELETE FROM graft.arrow.`$dir` WHERE v2 <= 16")
    val feed = spark.read.format("arrow")
      .option("readChangeFeed", "true")
      .option("startingEpoch", 1).load(dir)
    assert(feed.schema.fieldNames.toSeq ==
      Seq("id", "v2", "note", "_change_type", "_commit_epoch"))
    // the delete epoch nets to exactly the 4 removed rows, with the
    // renamed column's values served from pre-rename files
    val deletes = feed.filter(col("_change_type") === "delete")
      .select(col("id"), col("v2")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val inserts = feed.filter(col("_change_type") === "insert")
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert((deletes.map(_._1) -- inserts) == Set(1L, 2L, 3L, 4L),
      s"net deletes wrong: $deletes minus $inserts")
    assert(deletes.filter(d => d._1 <= 4).forall(d => d._2 == d._1 * 4))
  }

  test("rename/drop refuse while a CHECK constraint pins the column") {
    import spark.implicits._
    val dir = Files.createTempDirectory("evo_constraint").toString
    (1L to 10L).map(i => (i, i)).toDF("id", "amt")
      .write.format("arrow").mode("overwrite").save(dir)
    ArrowDataSource.initTableLog(dir)
    spark.sql(s"CALL graft.system.add_constraint(path => '$dir', " +
      "name => 'amt_pos', expr => 'amt >= 0')").collect()
    for (stmt <- Seq(
      s"CALL graft.system.rename_column(path => '$dir', " +
        "old_name => 'amt', new_name => 'amount')",
      s"CALL graft.system.drop_column(path => '$dir', name => 'amt')")) {
      val e = intercept[Exception] { spark.sql(stmt).collect() }
      assert(e.getMessage.contains("amt_pos"), e.getMessage)
    }
    // unpin → evolve works
    spark.sql(s"CALL graft.system.drop_constraint(path => '$dir', " +
      "name => 'amt_pos')").collect()
    spark.sql(s"CALL graft.system.rename_column(path => '$dir', " +
      "old_name => 'amt', new_name => 'amount')").collect()
    assert(spark.read.format("arrow").load(dir)
      .schema.fieldNames.toSeq == Seq("id", "amount"))
  }

  test("add_column with a DOTTED name adds a nullable struct LEAF " +
      "metadata-only; guards stay loud") {
    import spark.implicits._
    val dir = Files.createTempDirectory("addleaf").toString
    (1L to 12L).map(i => (i, (s"t$i", i * 2L))).toDF("id", "meta")
      .select(col("id"), col("meta").cast("struct<tag:string,amt:bigint>"))
      .write.format("arrow").mode("overwrite").save(dir)
    ArrowDataSource.initTableLog(dir)
    val filesBefore = ArrowDataSource.listIpcFiles(dir)
      .map(f => f.toString -> Files.getLastModifiedTime(f)).toMap

    val n = spark.sql(s"CALL graft.system.add_column(path => '$dir', " +
      "name => 'meta.score', type => 'double')").collect().head.getLong(0)
    assert(n == 2L) // top-level column count is unchanged
    assert(ArrowDataSource.listIpcFiles(dir)
      .map(f => f.toString -> Files.getLastModifiedTime(f)).toMap ==
      filesBefore, "leaf addition must not touch a data file")

    val df = spark.read.format("arrow").load(dir)
    assert(df.schema("meta").dataType.catalogString ==
      "struct<tag:string,amt:bigint,score:double>")
    assert(df.filter(col("meta.score").isNotNull).count() == 0)
    assert(df.agg(sum(col("meta.amt"))).head.getLong(0) ==
      (1L to 12L).map(_ * 2).sum)

    // a new write carries the evolved struct natively
    Seq((13L, ("t13", 26L, 0.5))).toDF("id", "meta")
      .select(col("id"),
        col("meta").cast("struct<tag:string,amt:bigint,score:double>"))
      .write.format("arrow").mode("append").save(dir)
    val evolved = spark.read.format("arrow").load(dir)
    assert(evolved.count() == 13)
    assert(evolved.filter(col("meta.score") === 0.5).select("id")
      .head.getLong(0) == 13L)

    // guards: duplicate leaf, missing parent, non-struct parent
    assertRefused(intercept[Exception] {
      spark.sql(s"CALL graft.system.add_column(path => '$dir', " +
        "name => 'meta.amt', type => 'bigint')").collect()
    }, "already exists")
    assertRefused(intercept[Exception] {
      spark.sql(s"CALL graft.system.add_column(path => '$dir', " +
        "name => 'nosuch.leaf', type => 'bigint')").collect()
    }, "no struct column")
    assertRefused(intercept[Exception] {
      spark.sql(s"CALL graft.system.add_column(path => '$dir', " +
        "name => 'id.leaf', type => 'bigint')").collect()
    }, "not a struct")
  }

  test("drop_column with a DOTTED name drops a struct LEAF " +
      "metadata-only: old files tolerated, resurrection refused, " +
      "rename composes") {
    import spark.implicits._
    val dir = Files.createTempDirectory("dropleaf").toString
    (1L to 15L).map(i => (i, (s"t$i", i * 2L, i * 0.5)))
      .toDF("id", "meta")
      .select(col("id"),
        col("meta").cast("struct<tag:string,amt:bigint,score:double>"))
      .write.format("arrow").mode("overwrite").save(dir)
    ArrowDataSource.initTableLog(dir)
    val filesBefore = ArrowDataSource.listIpcFiles(dir)
      .map(f => f.toString -> Files.getLastModifiedTime(f)).toMap

    val n = spark.sql(s"CALL graft.system.drop_column(path => '$dir', " +
      "name => 'meta.score')").collect().head.getLong(0)
    assert(n == 2L) // top-level column count unchanged (id, meta)
    assert(ArrowDataSource.listIpcFiles(dir)
      .map(f => f.toString -> Files.getLastModifiedTime(f)).toMap ==
      filesBefore, "leaf drop must not touch a data file")
    // old files (still carrying score bytes) read through the
    // narrowed declaration; the drift sweep tolerates them
    val df = spark.read.format("arrow").load(dir)
    assert(df.schema("meta").dataType.catalogString ==
      "struct<tag:string,amt:bigint>")
    assert(df.agg(sum(col("meta.amt"))).head.getLong(0) ==
      (1L to 15L).map(_ * 2).sum)
    // fsck agrees with the reader on what counts as drift
    val fsck = spark.sql(s"CALL graft.system.fsck(path => '$dir')")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(fsck.last == ("ok", "PASS"), fsck.mkString("\n"))
    // resurrection refuses on BOTH evolution paths
    assertRefused(intercept[Exception] {
      spark.sql(s"CALL graft.system.add_column(path => '$dir', " +
        "name => 'meta.score', type => 'double')").collect()
    }, "DROPPED")
    assertRefused(intercept[Exception] {
      Seq((99L, ("x", 1L, 9.9))).toDF("id", "meta")
        .select(col("id"),
          col("meta").cast("struct<tag:string,amt:bigint,score:double>"))
        .write.format("arrow").mode("append")
        .option("mergeSchema", "true").save(dir)
    }, "meta.score")
    // new writes carry the narrowed struct; reads stay whole
    Seq((16L, ("t16", 32L))).toDF("id", "meta")
      .select(col("id"), col("meta").cast("struct<tag:string,amt:bigint>"))
      .write.format("arrow").mode("append").save(dir)
    assert(spark.read.format("arrow").load(dir).count() == 16)
    // guards: last leaf, unknown leaf, non-struct parent
    assertRefused(intercept[Exception] {
      spark.sql(s"CALL graft.system.drop_column(path => '$dir', " +
        "name => 'meta.nosuch')").collect()
    }, "no struct leaf")
    assertRefused(intercept[Exception] {
      spark.sql(s"CALL graft.system.drop_column(path => '$dir', " +
        "name => 'id.leaf')").collect()
    }, "not a struct")
    // rename composes: pre-rename files carry the next dropped leaf
    // under the PHYSICAL parent name — the ledger covers both paths
    spark.sql(s"CALL graft.system.rename_column(path => '$dir', " +
      "old_name => 'meta', new_name => 'info')").collect()
    spark.sql(s"CALL graft.system.drop_column(path => '$dir', " +
      "name => 'info.tag')").collect()
    val renamed = spark.read.format("arrow").load(dir)
    assert(renamed.schema("info").dataType.catalogString ==
      "struct<amt:bigint>")
    assert(renamed.agg(sum(col("info.amt"))).head.getLong(0) ==
      (1L to 16L).map(_ * 2).sum)
    val fsck2 = spark.sql(s"CALL graft.system.fsck(path => '$dir')")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(fsck2.last == ("ok", "PASS"), fsck2.mkString("\n"))
  }

  test("writer drift against the declared schema fails loudly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("addcol_drift").toString
    (1L to 10L).map(i => (i, i)).toDF("id", "amt")
      .write.format("arrow").mode("overwrite").save(dir)
    ArrowDataSource.initTableLog(dir)
    spark.sql(s"CALL graft.system.add_column(path => '$dir', " +
      "name => 'note', type => 'string')").collect()
    // a foreign writer lands note as a LONG — type drift, not evolution
    (11L to 12L).map(i => (i, i, i * 10L)).toDF("id", "amt", "note")
      .write.format("arrow").mode("append").save(dir)
    val e = intercept[Exception] {
      spark.read.format("arrow").load(dir).collect()
    }
    assert(e.getMessage.contains("declared schema"),
      s"expected a declared-schema drift error, got: ${e.getMessage}")
  }
}

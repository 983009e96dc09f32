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

  import TestErrors.assertRefused

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

  test("mergeSchema on OVERWRITE merges additively (Delta semantics): " +
      "the declaration keeps the old columns, the data is replaced") {
    import spark.implicits._
    val dir = Files.createTempDirectory("mergewrite_ow").toString
    (1L to 10L).map(i => (i, i * 2L)).toDF("id", "amt")
      .write.format("arrow").mode("overwrite").save(dir)
    ArrowDataSource.initTableLog(dir)
    (11L to 15L).map(i => (i, s"n$i")).toDF("id", "note")
      .write.format("arrow").mode("overwrite")
      .option("mergeSchema", "true").save(dir)
    val df = spark.read.format("arrow").load(dir)
    assert(df.schema.fieldNames.toSeq == Seq("id", "amt", "note"))
    assert(df.count() == 5, "overwrite must replace the data")
    assert(df.filter(col("amt").isNull).count() == 5,
      "replaced files lack amt — it must read as nulls, not old bytes")
    assert(df.filter(col("note") === "n12").count() == 1)
    // and VERSION AS OF 0 still reads the pre-overwrite rows through
    // the current (merged) declaration
    val old = spark.read.format("arrow")
      .option("epochAsOf", "0").load(dir)
    assert(old.count() == 10 &&
      old.filter(col("note").isNull).count() == 10)
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

  test("mergeSchema on a PARTITIONED table: the new column evolves the " +
      "data schema, partition columns stay partition columns, and the " +
      "drifted rows route into the layout") {
    import spark.implicits._
    val dir = Files.createTempDirectory("mergewrite_part").toString
    (1L to 20L).map(i => (i, i % 3L, i * 2L)).toDF("id", "bucket", "amt")
      .write.format("arrow").partitionBy("bucket")
      .mode("overwrite").save(dir)
    (21L to 24L).map(i => (i, i % 3L, i * 2L, s"x$i"))
      .toDF("id", "bucket", "amt", "xtra")
      .write.format("arrow").partitionBy("bucket").mode("append")
      .option("mergeSchema", "true").save(dir)
    val df = spark.read.format("arrow").load(dir)
    // partition columns surface at the schema TAIL (layout contract);
    // the evolved data column slots before them
    assert(df.schema.fieldNames.toSeq == Seq("id", "amt", "xtra", "bucket"),
      s"schema order wrong: ${df.schema.fieldNames.toSeq}")
    assert(df.count() == 24)
    assert(df.filter(col("xtra").isNotNull).count() == 4)
    // the drifted rows landed inside the col=value layout and
    // partition pruning still works across generations
    assert(df.filter(col("bucket") === 0L && col("xtra").isNotNull)
      .count() == (21L to 24L).count(_ % 3 == 0))
  }

  test("a mergeSchema append addressed at a partition SUBDIRECTORY " +
      "evolves the TABLE-root declaration, not a nested one") {
    import spark.implicits._
    val dir = Files.createTempDirectory("mergewrite_subdir").toString
    (1L to 12L).map(i => (i, i % 2L, i * 2L)).toDF("id", "bucket", "amt")
      .write.format("arrow").partitionBy("bucket")
      .mode("overwrite").save(dir)
    ArrowDataSource.initTableLog(dir)
    // drifted append INTO bucket=1 (partition value implied by the
    // path, so the frame does not carry it); the table root has files
    // even though nothing under bucket=1 changes that fact — this must
    // NOT be treated as a first write, and the declaration must land
    // at the ROOT
    Seq((100L, 200L, "sub")).toDF("id", "amt", "xtra")
      .write.format("arrow").mode("append")
      .option("mergeSchema", "true").save(s"$dir/bucket=1")
    val root = java.nio.file.Paths.get(dir).toAbsolutePath.normalize
    assert(ArrowDataSource.declaredSchema(root).isDefined,
      "declaration must land at the table root")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths
      .get(dir, "bucket=1", "_graft_metadata")),
      "no nested metadata dir inside a partition directory")
    val df = spark.read.format("arrow").load(dir)
    assert(df.schema.fieldNames.toSeq ==
      Seq("id", "amt", "xtra", "bucket"))
    assert(df.count() == 13)
    assert(df.filter(col("xtra") === "sub")
      .select(col("bucket")).head.getLong(0) == 1L)
    assert(df.filter(col("xtra").isNull).count() == 12)
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

  test("a clobbered declaration fails reads LOUDLY and heals on the " +
      "next mergeSchema append carrying the column") {
    import spark.implicits._
    val dir = Files.createTempDirectory("mergewrite_clobber").toString
    (1L to 10L).map(i => (i, i * 2L)).toDF("id", "amt")
      .write.format("arrow").mode("overwrite").save(dir)
    ArrowDataSource.initTableLog(dir)
    (11L to 12L).map(i => (i, i * 2L, s"c$i")).toDF("id", "amt", "c1")
      .write.format("arrow").mode("append")
      .option("mergeSchema", "true").save(dir)
    assert(spark.read.format("arrow").load(dir).count() == 12)
    // simulate the LOSING side of a declaration race: a concurrent
    // writer rebuilt the sidecar from a snapshot without c1
    // (setDeclaredSchema is last-writer-wins)
    val root = java.nio.file.Paths.get(dir).toAbsolutePath.normalize
    ArrowDataSource.setDeclaredSchema(root,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("amt",
          org.apache.spark.sql.types.LongType))))
    // the drift sweep fails LOUDLY — never silent misreads
    val e = intercept[Exception] {
      spark.read.format("arrow").load(dir).collect()
    }
    assertRefused(e, "declared schema")
    // the next merge append carrying c1 re-declares it (the same
    // re-assertion ArrowBatchWrite.commit runs) and the table heals
    (13L to 13L).map(i => (i, i * 2L, s"c$i")).toDF("id", "amt", "c1")
      .write.format("arrow").mode("append")
      .option("mergeSchema", "true").save(dir)
    val healed = spark.read.format("arrow").load(dir)
    assert(healed.count() == 13)
    assert(healed.filter(col("c1").isNotNull).count() == 3)
  }

  test("casDeclaredSchema is a true compare-and-swap: stale " +
      "generations refuse, claims are atomic, readers resolve the " +
      "highest generation, legacy bare files read as generation 0") {
    import org.apache.spark.sql.types.{LongType, StringType,
      StructField, StructType}
    val root = Files.createTempDirectory("cas_schema")
      .toAbsolutePath.normalize
    val a = StructType(Seq(StructField("id", LongType)))
    val b = StructType(Seq(StructField("id", LongType),
      StructField("x", StringType, nullable = true)))
    val c = StructType(Seq(StructField("id", LongType),
      StructField("y", StringType, nullable = true)))
    // undeclared = gen -1; first publish lands g0
    assert(ArrowDataSource.declaredSchemaGen(root) == -1L)
    assert(ArrowDataSource.casDeclaredSchema(root, a, Set.empty,
      Map.empty, -1L))
    assert(ArrowDataSource.declaredSchemaGen(root) == 0L)
    assert(ArrowDataSource.declaredSchema(root).contains(a))
    // a STALE expected generation refuses — the racer-lost signal
    assert(!ArrowDataSource.casDeclaredSchema(root, b, Set.empty,
      Map.empty, -1L))
    assert(ArrowDataSource.declaredSchema(root).contains(a))
    // the winner advances; the loser recomputes against gen 0 and wins
    assert(ArrowDataSource.casDeclaredSchema(root, b, Set.empty,
      Map.empty, 0L))
    assert(!ArrowDataSource.casDeclaredSchema(root, c, Set.empty,
      Map.empty, 0L), "two writers claimed the same generation")
    assert(ArrowDataSource.casDeclaredSchema(root, c, Set.empty,
      Map.empty, 1L))
    assert(ArrowDataSource.declaredSchema(root).contains(c))
    assert(ArrowDataSource.declaredSchemaGen(root) == 2L)
    // legacy bare `_schema` (pre-CAS tables) reads as generation 0
    val legacy = Files.createTempDirectory("cas_legacy")
      .toAbsolutePath.normalize
    val md = legacy.resolve(ArrowDataSource.MetadataDirName)
    Files.createDirectories(md)
    Files.write(md.resolve(ArrowDataSource.SchemaFileName),
      java.util.List.of(a.toDDL))
    assert(ArrowDataSource.declaredSchemaGen(legacy) == 0L)
    assert(ArrowDataSource.declaredSchema(legacy).contains(a))
    assert(ArrowDataSource.casDeclaredSchema(legacy, b, Set.empty,
      Map.empty, 0L))
    assert(ArrowDataSource.declaredSchema(legacy).contains(b))
    // far-past generations prune on successful claims
    val r2 = Files.createTempDirectory("cas_prune")
      .toAbsolutePath.normalize
    (0 until 12).foreach(_ => ArrowDataSource.setDeclaredSchema(r2, a))
    val left = Files.list(r2.resolve(ArrowDataSource.MetadataDirName))
      .iterator()
    val names = scala.jdk.CollectionConverters
      .IteratorHasAsScala(left).asScala.map(_.getFileName.toString)
      .filter(_.startsWith("_schema.g")).toSeq
    assert(names.length <= 9, s"generations never prune: $names")
  }

  test("evolveDeclaration RECOMPUTES against a racer's declaration on " +
      "a lost claim — a procedure can never last-writer-wins away a " +
      "concurrent mergeSchema column") {
    import org.apache.spark.sql.types.{LongType, StringType,
      StructField, StructType}
    val root = Files.createTempDirectory("cas_evolve")
      .toAbsolutePath.normalize
    val base = StructType(Seq(StructField("id", LongType)))
    ArrowDataSource.setDeclaredSchema(root, base)
    var first = true
    ArrowDataSource.evolveDeclaration(root) { () =>
      val cur = ArrowDataSource.declaredSchema(root).get
      if (first) {
        first = false
        // a racer lands column c BETWEEN our read and our claim
        assert(ArrowDataSource.casDeclaredSchema(root,
          StructType(cur.fields :+
            StructField("c", StringType, nullable = true)),
          Set.empty, Map.empty, ArrowDataSource.declaredSchemaGen(root)))
      }
      (StructType(cur.fields :+
        StructField("mine", LongType, nullable = true)),
        Set.empty, Map.empty, Map.empty)
    }
    val out = ArrowDataSource.declaredSchema(root).get.fieldNames.toSet
    assert(out == Set("id", "c", "mine"),
      s"the racer's column was last-writer-wins'd away: $out")
  }

  test("a REFUSED mergeSchema batch append into a streaming-sink " +
      "directory leaves no phantom declaration behind") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("mergewrite_sinkdir").toString
    val ckpt = Files.createTempDirectory("mergewrite_sinkckpt").toString
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)]
    input.addData((1L, 2L))
    val q = input.toDF().toDF("id", "amt").writeStream.format("arrow")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(dir)
    try q.processAllAvailable() finally q.stop()
    // the batch-append guard refuses writes into sink dirs; with
    // mergeSchema set, the refusal must come WITHOUT first planting
    // the drifted column in the sink's schema sidecar
    val e = intercept[Exception] {
      Seq((9L, 9L, "phantom")).toDF("id", "amt", "xtra")
        .write.format("arrow").mode("append")
        .option("mergeSchema", "true").save(dir)
    }
    assertRefused(e, "streaming commit log")
    val root = java.nio.file.Paths.get(dir).toAbsolutePath.normalize
    assert(ArrowDataSource.declaredSchema(root).isEmpty,
      "refused write mutated the sink's declared schema")
    assert(spark.read.format("arrow").load(dir)
      .schema.fieldNames.toSeq == Seq("id", "amt"))
  }

  test("NESTED evolution: a struct column gains a leaf field-wise — " +
      "old files serve the leaf as nulls, leaf type conflicts refuse") {
    import spark.implicits._
    val dir = Files.createTempDirectory("mergewrite_nested").toString
    (1L to 20L).map(i => (i, (s"s$i", i * 2L)))
      .toDF("id", "meta")
      .select(col("id"), col("meta").cast("struct<tag:string,amt:bigint>"))
      .repartition(2)
      .write.format("arrow").mode("overwrite").save(dir)
    ArrowDataSource.initTableLog(dir)
    val before = ArrowDataSource.listIpcFiles(dir)
      .map(f => f.toString -> Files.getLastModifiedTime(f)).toMap

    (21L to 25L).map(i => (i, (s"s$i", i * 2L, s"new$i"))).toDF("id", "meta")
      .select(col("id"),
        col("meta").cast("struct<tag:string,amt:bigint,extra:string>"))
      .write.format("arrow").mode("append")
      .option("mergeSchema", "true").save(dir)

    val after = ArrowDataSource.listIpcFiles(dir)
      .map(f => f.toString -> Files.getLastModifiedTime(f)).toMap
    assert(before.forall { case (k, v) => after.get(k).contains(v) },
      "nested mergeSchema append must not rewrite pre-existing files")

    val df = spark.read.format("arrow").load(dir)
    assert(df.schema("meta").dataType.catalogString ==
      "struct<tag:string,amt:bigint,extra:string>")
    assert(df.count() == 25)
    assert(df.filter(col("meta.extra").isNull).count() == 20)
    assert(df.filter(col("meta.extra") === "new23").select("id")
      .head.getLong(0) == 23L)
    // pre-evolution leaves still read from both generations
    assert(df.agg(sum(col("meta.amt"))).head.getLong(0) ==
      (1L to 25L).map(_ * 2).sum)

    // an old-shape frame (narrower struct) still appends plainly:
    // its footer is a tolerated SUBSET of the declared struct
    (26L to 27L).map(i => (i, (s"s$i", i * 2L))).toDF("id", "meta")
      .select(col("id"), col("meta").cast("struct<tag:string,amt:bigint>"))
      .write.format("arrow").mode("append").save(dir)
    assert(spark.read.format("arrow").load(dir).count() == 27)

    // a LEAF type conflict refuses, naming the dotted path
    val e = intercept[Exception] {
      Seq((99L, ("x", "not-a-long"))).toDF("id", "meta")
        .select(col("id"), col("meta").cast("struct<tag:string,amt:string>"))
        .write.format("arrow").mode("append")
        .option("mergeSchema", "true").save(dir)
    }
    assertRefused(e, "meta.amt")
  }

  test("names resolve case-insensitively: an incoming case variant " +
      "refuses loudly, never declares a duplicate-modulo-case twin") {
    import spark.implicits._
    val dir = Files.createTempDirectory("mergewrite_case").toString
    (1L to 10L).map(i => (i, i * 2L)).toDF("id", "amt")
      .write.format("arrow").mode("overwrite").save(dir)
    ArrowDataSource.initTableLog(dir)
    // a case variant resolves to the declared column but would land
    // footers under the variant spelling (footers match
    // case-sensitively) — refuse, don't declare a twin or let the
    // footer drift brick later reads
    val e = intercept[Exception] {
      Seq((11L, 22L, "x")).toDF("id", "AMT", "note")
        .write.format("arrow").mode("append")
        .option("mergeSchema", "true").save(dir)
    }
    assertRefused(e, "align the column's case")
    val root = java.nio.file.Paths.get(dir).toAbsolutePath.normalize
    // the refusal happened before any declaration landed
    assert(ArrowDataSource.declaredSchema(root).forall(
      _.fieldNames.forall(n => n == n.toLowerCase)),
      "refused case-variant write left a duplicate-modulo-case twin")
    assert(spark.read.format("arrow").load(dir).count() == 10)
    // aligned case merges normally
    Seq((11L, 22L, "x")).toDF("id", "amt", "note")
      .write.format("arrow").mode("append")
      .option("mergeSchema", "true").save(dir)
    val df = spark.read.format("arrow").load(dir)
    assert(df.schema.fieldNames.toSeq == Seq("id", "amt", "note"))
    assert(df.count() == 11)
  }

  test("a sink-root OVERWRITE with mergeSchema refuses loudly instead " +
      "of silently dropping the option") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("mergewrite_sinkow").toString
    val ckpt = Files.createTempDirectory("mergewrite_sinkowck").toString
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)]
    input.addData((1L, 2L))
    val q = input.toDF().toDF("id", "amt").writeStream.format("arrow")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(dir)
    try q.processAllAvailable() finally q.stop()
    val e = intercept[Exception] {
      Seq((9L, 9L, "x")).toDF("id", "amt", "xtra")
        .write.format("arrow").mode("overwrite")
        .option("mergeSchema", "true").save(dir)
    }
    assertRefused(e, "nothing to merge")
    // without the option, the overwrite (plain replace) still works
    Seq((9L, 9L, "x")).toDF("id", "amt", "xtra")
      .write.format("arrow").mode("overwrite").save(dir)
    assert(spark.read.format("arrow").load(dir).count() == 1)
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

package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.arrow.{ArrowDataSource, GraftCatalog}

/** Zero-copy SHALLOW CLONE (`CALL graft.system.clone`): the clone
  * reads the source's bytes without copying them, diverges via its own
  * copy-on-write files under DML, never endangers the source, and
  * fails fast (never silently drops rows) if the source vacuums a
  * borrowed file away. */
class ArrowCloneSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSession.spark
    s.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    s
  }

  private def bagEqual(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  private def arrowFilesUnder(dir: String): Seq[String] =
    ArrowDataSource.listIpcFiles(dir).map(_.toString)

  test("clone is metadata-only, reads the source exactly, and clones " +
      "a chosen VERSION") {
    import spark.implicits._
    val src = Files.createTempDirectory("clone_src").toString
    val dst = Files.createTempDirectory("clone_dst").toString
    Files.delete(Paths.get(dst)) // clone wants an absent/empty target
    (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "tag")
      .repartition(3)
      .write.format("arrow").mode("overwrite").save(src)
    ArrowDataSource.initTableLog(src)
    val preDml = ArrowDataSource.latestCommittedEpoch(
      Paths.get(src).toAbsolutePath.normalize)
    spark.sql(s"DELETE FROM graft.arrow.`$src` WHERE id <= 40")

    spark.sql(s"CALL graft.system.clone(src_path => '$src', " +
      s"dst_path => '$dst')").collect()
    assert(arrowFilesUnder(dst).isEmpty,
      "shallow clone must move ZERO data bytes into the clone")
    assert(bagEqual(spark.read.format("arrow").load(dst),
      spark.read.format("arrow").load(src)),
      "clone must read exactly the source's current version")
    assert(spark.read.format("arrow").load(dst).count() == 60)

    // clone a historical version of the source
    val dstV = Files.createTempDirectory("clone_dstv").toString
    Files.delete(Paths.get(dstV))
    spark.sql(s"CALL graft.system.clone(src_path => '$src', " +
      s"dst_path => '$dstV', epoch => $preDml)").collect()
    assert(spark.read.format("arrow").load(dstV).count() == 100,
      "epoch-pinned clone must resolve the PRE-delete file set")

    // a clone target that already holds a table refuses
    val err = intercept[Exception] {
      spark.sql(s"CALL graft.system.clone(src_path => '$src', " +
        s"dst_path => '$dst')").collect()
    }
    assert(err.getMessage.contains("must be empty"))
  }

  test("DML on the clone copy-on-writes into its OWN files; the " +
      "source never changes; vacuum on the clone spares borrowed files") {
    import spark.implicits._
    val src = Files.createTempDirectory("clone_cow_src").toString
    val dst = Files.createTempDirectory("clone_cow_dst").toString
    Files.delete(Paths.get(dst))
    (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "tag")
      .repartition(2)
      .write.format("arrow").mode("overwrite").save(src)
    ArrowDataSource.initTableLog(src)
    spark.sql(s"CALL graft.system.clone(src_path => '$src', " +
      s"dst_path => '$dst')").collect()
    val srcFilesBefore = arrowFilesUnder(src).toSet

    spark.sql(s"DELETE FROM graft.arrow.`$dst` WHERE id % 2 = 0")
    spark.sql(s"UPDATE graft.arrow.`$dst` SET tag = 'mine' WHERE id = 1")
    assert(spark.read.format("arrow").load(dst).count() == 50)
    assert(spark.read.format("arrow").load(src).count() == 100,
      "DML on the clone leaked into the source")
    assert(arrowFilesUnder(src).toSet == srcFilesBefore,
      "the source's file set must be untouched by clone DML")
    assert(arrowFilesUnder(dst).nonEmpty,
      "clone DML must copy-on-write into files under the CLONE root")
    // the source still reads its original content
    assert(spark.read.format("arrow").load(src)
      .filter(col("tag") === "mine").count() == 0)

    // vacuum the clone aggressively: borrowed files are outside its
    // root and must survive; only the clone's own replaced files go
    spark.sql(s"CALL graft.system.vacuum(path => '$dst', " +
      "grace_ms => 0)").collect()
    assert(srcFilesBefore.forall(f => Files.exists(Paths.get(f))),
      "vacuum on the clone reclaimed the SOURCE's files")
    assert(spark.read.format("arrow").load(dst).count() == 50,
      "clone must stay readable after its own vacuum")
    assert(spark.read.format("arrow").load(src).count() == 100)
  }

  test("a borrowed file the source vacuums away fails the clone's " +
      "read FAST, with re-clone guidance — never a silent row drop") {
    import spark.implicits._
    val src = Files.createTempDirectory("clone_vac_src").toString
    val dst = Files.createTempDirectory("clone_vac_dst").toString
    Files.delete(Paths.get(dst))
    (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "tag")
      .repartition(2)
      .write.format("arrow").mode("overwrite").save(src)
    ArrowDataSource.initTableLog(src)
    spark.sql(s"CALL graft.system.clone(src_path => '$src', " +
      s"dst_path => '$dst')").collect()
    // the source rewrites everything, then reclaims the old generation
    spark.sql(s"UPDATE graft.arrow.`$src` SET tag = 'new'")
    spark.sql(s"CALL graft.system.vacuum(path => '$src', " +
      "grace_ms => 0)").collect()
    val err = intercept[Exception] {
      spark.read.format("arrow").load(dst).count()
    }
    assert(err.getMessage.contains("re-clone"),
      s"expected the fast-failure guidance, got: ${err.getMessage}")
  }

  test("cloning a partitioned table keeps partition columns AND " +
      "planning-time pruning through borrowed `../` paths") {
    import spark.implicits._
    val src = Files.createTempDirectory("clone_part_src").toString
    val dst = Files.createTempDirectory("clone_part_dst").toString
    Files.delete(Paths.get(dst))
    (1 to 90).map(i => (i.toLong, s"p${i % 3}", i * 2L))
      .toDF("id", "part", "amt")
      .write.format("arrow").partitionBy("part")
      .option("optimizeWrite", "true")
      .mode("overwrite").save(src)
    ArrowDataSource.initTableLog(src)
    spark.sql(s"CALL graft.system.clone(src_path => '$src', " +
      s"dst_path => '$dst')").collect()
    val cloned = spark.read.format("arrow").load(dst)
    assert(cloned.schema.fieldNames.contains("part"),
      "partition column lost through the clone")
    assert(bagEqual(cloned, spark.read.format("arrow").load(src)))
    assert(cloned.filter(col("part") === "p1").count() == 30)
    // pruning: only p1's files plan (borrowed rels still carry the
    // col=value segment, and discovery reads the TRAILING run)
    val plan = cloned.filter(col("part") === "p1")
      .queryExecution.executedPlan
    val scans = plan.collectLeaves().map(_.toString).mkString("\n")
    assert(!scans.contains("part=p0") || !scans.contains("part=p2"),
      "partition pruning lost through the clone")
  }

  test("a source table whose ROOT directory is col=value-shaped does " +
      "not fabricate a partition column on its clone") {
    import spark.implicits._
    // the source table lives at .../day=5 — an unpartitioned table in
    // a directory that merely LOOKS like a Hive partition segment. The
    // clone's borrowed rels are `../day=5/part.arrow`; trailing
    // col=value discovery must stop at the source-table root, not
    // invent a 'day' column
    val base = Files.createTempDirectory("clone_eqroot")
    val src = base.resolve("day=5").toString
    val dst = base.resolve("the_clone").toString
    (1 to 40).map(i => (i.toLong, s"v$i")).toDF("id", "tag")
      .coalesce(1).write.format("arrow").mode("overwrite").save(src)
    ArrowDataSource.initTableLog(src)
    spark.sql(s"CALL graft.system.clone(src_path => '$src', " +
      s"dst_path => '$dst')").collect()
    val cloned = spark.read.format("arrow").load(dst)
    assert(cloned.schema.fieldNames.toSeq == Seq("id", "tag"),
      s"clone fabricated a partition column: " +
        s"${cloned.schema.fieldNames.toSeq}")
    assert(bagEqual(cloned, spark.read.format("arrow").load(src)))

    // and a genuinely partitioned source under a col=value-shaped root
    // keeps exactly its REAL partition columns through the clone
    val src2 = base.resolve("day=6").toString
    val dst2 = base.resolve("the_clone2").toString
    (1 to 30).map(i => (i.toLong, s"p${i % 2}")).toDF("id", "part")
      .write.format("arrow").partitionBy("part")
      .mode("overwrite").save(src2)
    ArrowDataSource.initTableLog(src2)
    spark.sql(s"CALL graft.system.clone(src_path => '$src2', " +
      s"dst_path => '$dst2')").collect()
    val cloned2 = spark.read.format("arrow").load(dst2)
    assert(cloned2.schema.fieldNames.contains("part") &&
      !cloned2.schema.fieldNames.contains("day"),
      s"expected only 'part': ${cloned2.schema.fieldNames.toSeq}")
    assert(cloned2.filter(col("part") === "p1").count() == 15)

    // the hard case no path heuristic can classify: the source table
    // root sits at a NESTED all-col=value path. The clone's recorded
    // partition list (epoch-0 metadata) is the only correct answer.
    val src3 = base.resolve("a=1").resolve("b=2").toString
    val dst3 = base.resolve("the_clone3").toString
    (1 to 20).map(i => (i.toLong, s"v$i")).toDF("id", "tag")
      .coalesce(1).write.format("arrow").mode("overwrite").save(src3)
    ArrowDataSource.initTableLog(src3)
    spark.sql(s"CALL graft.system.clone(src_path => '$src3', " +
      s"dst_path => '$dst3')").collect()
    val cloned3 = spark.read.format("arrow").load(dst3)
    assert(cloned3.schema.fieldNames.toSeq == Seq("id", "tag"),
      s"nested col=value source path fabricated partition columns: " +
        s"${cloned3.schema.fieldNames.toSeq}")
    assert(cloned3.count() == 20)
  }

  test("cloning a partition-EVOLVED source carries the write spec and " +
      "type ledger: filters stay exact over byte-carried generations " +
      "and the recorded type survives") {
    import spark.implicits._
    val src = Files.createTempDirectory("clone_evo_src").toString
    val dst = Files.createTempDirectory("clone_evo_dst").toString
    Files.delete(Paths.get(dst))
    // `bucket` holds NUMERIC-LOOKING strings: without the type ledger,
    // the clone's dir-value inference would re-type it LongType and
    // misbind the old generation's byte-carried StringType vector
    val d = (1 to 200).map(i => (i.toLong, (i % 4).toString, i * 2L))
      .toDF("id", "bucket", "amt")
    d.filter(col("id") <= 120) // old generation: bucket in BYTES
      .write.format("arrow").mode("overwrite").save(src)
    spark.sql("CALL graft.system.set_partitioning(path => " +
      s"'$src', cols => 'bucket')").collect()
    val tableOrder = spark.read.format("arrow").load(src)
      .schema.fieldNames.toSeq
    d.filter(col("id") > 120) // new generation: bucket in PATH
      .select(tableOrder.map(col): _*)
      .write.format("arrow").mode("append").save(src)

    spark.sql(s"CALL graft.system.clone(src_path => '$src', " +
      s"dst_path => '$dst')").collect()
    val dstRoot = Paths.get(dst).toAbsolutePath.normalize
    val md = dstRoot.resolve(ArrowDataSource.MetadataDirName)
    // the evolution record travels with the clone (ADVICE r12, high):
    // without it maybeEvolved() is false and pushFilters claims
    // partition filters EXACT over borrowed byte-carried files
    assert(Files.isRegularFile(
      md.resolve(ArrowDataSource.PartSpecFileName)),
      "clone dropped the source's _partition_spec")
    assert(Files.isRegularFile(
      md.resolve(ArrowDataSource.PartTypesFileName)),
      "clone dropped the source's _partition_types ledger")
    assert(ArrowDataSource.recordedPartitionTypes(dstRoot)
      .get("bucket").contains(org.apache.spark.sql.types.StringType),
      "clone lost the authoritative StringType for bucket")

    val cloned = spark.read.format("arrow").load(dst)
    assert(cloned.schema("bucket").dataType ==
      org.apache.spark.sql.types.StringType,
      s"clone re-typed bucket: ${cloned.schema("bucket").dataType}")
    assert(bagEqual(cloned, spark.read.format("arrow").load(src)))
    // the filter must evaluate the OLD generation's byte values, not
    // claim EXACT on path values the borrowed files don't expose:
    // 50 matches in each generation = 50 total per bucket value
    val f = cloned.filter(col("bucket") === "1")
    assert(f.count() == 50,
      s"evolved-clone filter dropped byte-generation rows: ${f.count()}")
    // exceptAll is positional and evolution reorders the schema
    // (partition column last) — align on d's column order by name
    assert(bagEqual(f.select(d.columns.map(col).toIndexedSeq: _*),
      d.filter(col("bucket") === "1")),
      "evolved-clone filtered rows drifted")
    // grouped aggregate over the evolved column: exact groups from
    // BOTH generations (the evolution guard must see the clone as
    // evolved and keep the group column off the pushed path)
    val g = cloned.groupBy(col("bucket"))
      .agg(org.apache.spark.sql.functions.sum(col("amt")).as("s"))
      .orderBy(col("bucket"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val exp = d.groupBy(col("bucket"))
      .agg(org.apache.spark.sql.functions.sum(col("amt")).as("s"))
      .orderBy(col("bucket"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(g == exp, s"evolved-clone grouped aggregate drifted: $g vs $exp")
  }
}

package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.arrow.{ArrowDataSource, GraftCatalog}

/** WRITE-AUDIT-PUBLISH (`CALL graft.system.publish`): stage DML on a
  * zero-copy clone branch, audit it there, then land the branch state
  * as ONE atomic epoch on main — borrowed files stay put, branch-
  * written files rename (no copy), DV masks carry, and a main that
  * advanced since the clone refuses the publish with nothing visible. */
class WapSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSession.spark
    s.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    s
  }

  private def bagEqual(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  private def freshPair(): (String, String) = {
    val main = Files.createTempDirectory("wap_main").toString
    val branch = Files.createTempDirectory("wap_branch").toString
    Files.delete(Paths.get(branch))
    (main, branch)
  }

  private def build(main: String): Unit = {
    import spark.implicits._
    (1 to 100).map(i => (i.toLong, (i % 7).toLong, s"v$i"))
      .toDF("id", "grp", "tag")
      .repartition(3)
      .write.format("arrow").mode("overwrite").save(main)
    ArrowDataSource.initTableLog(main)
  }

  test("publish lands staged DML (insert + DV delete + update) as one " +
      "epoch; main equals the audited branch; only branch bytes move") {
    val (main, branch) = freshPair()
    build(main)
    spark.sql(s"CALL graft.system.set_dv(path => '$main')").collect()
    val epochBefore = ArrowDataSource.latestCommittedEpoch(
      Paths.get(main).toAbsolutePath.normalize)
    spark.sql(s"CALL graft.system.clone(src_path => '$main', " +
      s"dst_path => '$branch')").collect()
    // stage on the branch: the WRITE phase
    spark.sql(s"INSERT INTO graft.arrow.`$branch` VALUES " +
      "(201, 1, 'staged'), (202, 2, 'staged')")
    spark.sql(s"DELETE FROM graft.arrow.`$branch` WHERE id <= 10")
    spark.sql(s"UPDATE graft.arrow.`$branch` SET tag = 'audited' " +
      "WHERE grp = 3")
    // AUDIT on the branch while main still serves the old version
    val branchDf = spark.read.format("arrow").load(branch)
    assert(branchDf.count() == 92)
    assert(spark.read.format("arrow").load(main).count() == 100,
      "main must be untouched while the branch stages")
    val staged = branchDf.collect().toSet
    // PUBLISH
    val row = spark.sql(s"CALL graft.system.publish(" +
      s"branch_path => '$branch', main_path => '$main')").collect().head
    val mainRoot = Paths.get(main).toAbsolutePath.normalize
    assert(ArrowDataSource.latestCommittedEpoch(mainRoot) ==
      epochBefore + 1, "publish must be exactly ONE epoch on main")
    val published = spark.read.format("arrow").load(main)
    assert(published.collect().toSet == staged,
      "main after publish must equal the audited branch state")
    assert(row.getLong(3) > 0L, "branch-written files should have moved")
    // time travel still serves the pre-publish version
    val old = spark.read.format("arrow")
      .option("epochAsOf", epochBefore.toString).load(main)
    assert(old.count() == 100, "pre-publish version must stay readable")
    // and the DV delete carried as a mask on borrowed files
    assert(published.filter(col("id") <= 10).count() == 0)
  }

  test("publish refuses a diverged main and a spent branch, atomically") {
    val (main, branch) = freshPair()
    build(main)
    spark.sql(s"CALL graft.system.clone(src_path => '$main', " +
      s"dst_path => '$branch')").collect()
    spark.sql(s"INSERT INTO graft.arrow.`$branch` VALUES (300, 0, 'b')")
    // main advances AFTER the clone: publish must refuse
    spark.sql(s"INSERT INTO graft.arrow.`$main` VALUES (400, 0, 'm')")
    val mainBefore = spark.read.format("arrow").load(main).collect().toSet
    val e = intercept[Exception] {
      spark.sql(s"CALL graft.system.publish(" +
        s"branch_path => '$branch', main_path => '$main')").collect()
    }
    assert(e.getMessage != null &&
      e.getMessage.contains("re-clone"),
      s"unexpected error: ${e.getMessage}")
    assert(spark.read.format("arrow").load(main).collect().toSet ==
      mainBefore, "a refused publish must leave main untouched")

    // happy path on a fresh branch, then the SAME branch is spent:
    // main advanced past its recorded base, so a second publish refuses
    val branch2 = Files.createTempDirectory("wap_branch2").toString
    Files.delete(Paths.get(branch2))
    spark.sql(s"CALL graft.system.clone(src_path => '$main', " +
      s"dst_path => '$branch2')").collect()
    spark.sql(s"DELETE FROM graft.arrow.`$branch2` WHERE id = 1")
    spark.sql(s"CALL graft.system.publish(" +
      s"branch_path => '$branch2', main_path => '$main')").collect()
    intercept[Exception] {
      spark.sql(s"CALL graft.system.publish(" +
        s"branch_path => '$branch2', main_path => '$main')").collect()
    }
  }

  test("publish racing a concurrent append serializes: every outcome " +
      "is one of the two legal histories") {
    import spark.implicits._
    for (round <- 1 to 4) {
      val (main, branch) = freshPair()
      build(main)
      spark.sql(s"CALL graft.system.clone(src_path => '$main', " +
        s"dst_path => '$branch')").collect()
      spark.sql(s"DELETE FROM graft.arrow.`$branch` WHERE id <= 50")
      val start = new java.util.concurrent.CountDownLatch(1)
      @volatile var publishErr: Option[Throwable] = None
      val publisher = new Thread(() => {
        start.await()
        try spark.sql(s"CALL graft.system.publish(" +
          s"branch_path => '$branch', main_path => '$main')").collect()
        catch { case t: Throwable => publishErr = Some(t) }
      })
      val appender = new Thread(() => {
        start.await()
        // blind append: rebases past a winning publish, never conflicts
        (900 to 902).map(i => (i.toLong, 0L, "raced"))
          .toDF("id", "grp", "tag")
          .write.format("arrow").mode("append").save(main)
      })
      publisher.start(); appender.start()
      start.countDown()
      publisher.join(120000); appender.join(120000)
      val ids = spark.read.format("arrow").load(main)
        .select(col("id")).collect().map(_.getLong(0)).toSet
      val appended = Set(900L, 901L, 902L)
      val expected =
        if (publishErr.isEmpty) (51L to 100L).toSet ++ appended
        else (1L to 100L).toSet ++ appended
      assert(ids == expected,
        s"round $round (publish ${publishErr.fold("won")(e =>
          s"refused: ${e.getMessage.take(60)}")}): " +
          s"diff=${(ids diff expected) ++ (expected diff ids)}")
      // a refused publish must be a clean concurrent-modification error
      publishErr.foreach { e =>
        assert(e.getMessage != null && (
          e.getMessage.contains("re-clone") ||
            e.getMessage.contains("retry against")),
          s"unexpected failure mode: $e")
      }
    }
  }

  test("an EVOLVED table clones with its declared schema; staged DML " +
      "on renamed columns publishes; branch-side evolution refuses") {
    import spark.implicits._
    val (main, branch) = freshPair()
    (1L to 30L).map(i => (i, i * 2L)).toDF("id", "v1")
      .repartition(2)
      .write.format("arrow").mode("overwrite").save(main)
    ArrowDataSource.initTableLog(main)
    spark.sql(s"CALL graft.system.rename_column(path => '$main', " +
      "old_name => 'v1', new_name => 'v2')").collect()
    spark.sql(s"CALL graft.system.add_column(path => '$main', " +
      "name => 'note', type => 'string')").collect()
    spark.sql(s"INSERT INTO graft.arrow.`$main` VALUES (100, 5, 'x')")
    spark.sql(s"CALL graft.system.clone(src_path => '$main', " +
      s"dst_path => '$branch')").collect()
    // the clone carries the declared schema + ledgers: mixed-generation
    // borrowed files read under the evolved names
    val b = spark.read.format("arrow").load(branch)
    assert(b.schema.fieldNames.toSeq == Seq("id", "v2", "note"))
    assert(b.count() == 31)
    // staged DML keyed on the RENAMED column, then publish
    spark.sql(s"DELETE FROM graft.arrow.`$branch` WHERE v2 <= 10")
    spark.sql(s"CALL graft.system.publish(branch_path => '$branch', " +
      s"main_path => '$main')").collect()
    val m = spark.read.format("arrow").load(main)
    // 5 seed rows (v2 = 2..10) plus the inserted row (v2 = 5) matched
    assert(m.count() == 25 && m.agg(min(col("v2"))).head.getLong(0) == 12L)

    // a branch that EVOLVES its schema cannot publish
    val branch2 = Files.createTempDirectory("wap_evo2").toString
    Files.delete(Paths.get(branch2))
    spark.sql(s"CALL graft.system.clone(src_path => '$main', " +
      s"dst_path => '$branch2')").collect()
    spark.sql(s"CALL graft.system.add_column(path => '$branch2', " +
      "name => 'extra', type => 'bigint')").collect()
    val e = intercept[Exception] {
      spark.sql(s"CALL graft.system.publish(branch_path => '$branch2', " +
        s"main_path => '$main')").collect()
    }
    assert(e.getMessage.contains("schema"), e.getMessage)
  }

  test("branches inherit CHECK constraints; constraint divergence " +
      "refuses the publish") {
    import spark.implicits._
    val (main, branch) = freshPair()
    build(main)
    spark.sql(s"CALL graft.system.add_constraint(path => '$main', " +
      "name => 'id_pos', expr => 'id > 0')").collect()
    spark.sql(s"CALL graft.system.clone(src_path => '$main', " +
      s"dst_path => '$branch')").collect()
    // the inherited gate blocks a violating stage on the BRANCH
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO graft.arrow.`$branch` VALUES (-5, 0, 'bad')")
    }
    assert(String.valueOf(e.getMessage).contains("id_pos") ||
      Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .exists(t => String.valueOf(t.getMessage).contains("id_pos")),
      s"violating stage was not gated: $e")
    // a clean stage publishes
    spark.sql(s"INSERT INTO graft.arrow.`$branch` VALUES (300, 0, 'ok')")
    spark.sql(s"CALL graft.system.publish(branch_path => '$branch', " +
      s"main_path => '$main')").collect()
    assert(spark.read.format("arrow").load(main).count() == 101)

    // diverged constraints refuse: main tightens after the clone
    val branch2 = Files.createTempDirectory("wap_cons2").toString
    Files.delete(Paths.get(branch2))
    spark.sql(s"CALL graft.system.clone(src_path => '$main', " +
      s"dst_path => '$branch2')").collect()
    spark.sql(s"DELETE FROM graft.arrow.`$branch2` WHERE id = 2")
    spark.sql(s"CALL graft.system.add_constraint(path => '$main', " +
      "name => 'id_cap', expr => 'id < 1000000', " +
      "validate => false)").collect()
    // main advanced? add_constraint is metadata-only (no epoch), so
    // the base-epoch check alone would not catch it — the constraint
    // ledger comparison must
    val e2 = intercept[Exception] {
      spark.sql(s"CALL graft.system.publish(branch_path => '$branch2', " +
        s"main_path => '$main')").collect()
    }
    assert(e2.getMessage.contains("constraints"), e2.getMessage)
  }

  test("publish refuses a non-clone table") {
    val (main, other) = freshPair()
    build(main)
    build(other) // a real table, but not a clone of main
    val e = intercept[Exception] {
      spark.sql(s"CALL graft.system.publish(" +
        s"branch_path => '$other', main_path => '$main')").collect()
    }
    assert(e.getMessage.contains("clone lineage"))
  }
}

package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.arrow.{ArrowDataSource, GraftCatalog, TableConstraints}

/** Write-time CHECK constraints (`add_constraint`): every writer path
  * — batch append, UPDATE/MERGE replacement, streaming sink — gates
  * rows before a byte lands, a violation aborts BEFORE the epoch
  * commits (atomic: no partial batch becomes visible), and SQL CHECK
  * three-valued semantics hold (NULL passes). */
class ArrowConstraintSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSession.spark
    s.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    s
  }

  private def fixture(prefix: String): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory(prefix).toString
    (1 to 50).map(i => (i.toLong, i * 10L)).toDF("id", "amount")
      .coalesce(1)
      .write.format("arrow").mode("overwrite").save(dir)
    ArrowDataSource.initTableLog(dir)
    dir
  }

  test("a violating batch append aborts ATOMICALLY before its epoch " +
      "commits; valid appends pass; NULL passes (SQL CHECK)") {
    import spark.implicits._
    val dir = fixture("con_basic")
    spark.sql(s"CALL graft.system.add_constraint(path => '$dir', " +
      "name => 'amount_pos', expr => 'amount > 0')").collect()
    val root = Paths.get(dir).toAbsolutePath.normalize
    val epochBefore = ArrowDataSource.latestCommittedEpoch(root)

    // valid rows + a NULL (unknown passes, SQL CHECK semantics)
    Seq((100L, Some(5L)), (101L, None: Option[Long]))
      .toDF("id", "amount")
      .write.format("arrow").mode("append").save(dir)
    assert(spark.read.format("arrow").load(dir).count() == 52)

    // a batch with one violating row: NOTHING of it may land
    val err = intercept[Exception] {
      Seq((200L, 7L), (201L, -3L), (202L, 9L)).toDF("id", "amount")
        .write.format("arrow").mode("append").save(dir)
    }
    val msgs = Iterator.iterate(err: Throwable)(_.getCause)
      .takeWhile(_ != null).map(String.valueOf).mkString("\n")
    assert(msgs.contains("amount_pos"), s"wrong failure: $msgs")
    assert(spark.read.format("arrow").load(dir).count() == 52,
      "a violating batch leaked rows — the abort was not atomic")
    assert(spark.read.format("arrow").load(dir)
      .filter(col("id") >= 200).count() == 0)
    assert(ArrowDataSource.latestCommittedEpoch(root) == epochBefore + 1,
      "the failed write must not burn a committed epoch beyond the " +
        "valid append")
  }

  test("UPDATE SET through the CoW path is gated; DELETE is not " +
      "(removing rows cannot violate a CHECK)") {
    val dir = fixture("con_update")
    spark.sql(s"CALL graft.system.add_constraint(path => '$dir', " +
      "name => 'amount_pos', expr => 'amount > 0')").collect()
    val err = intercept[Exception] {
      spark.sql(s"UPDATE graft.arrow.`$dir` SET amount = -1 " +
        "WHERE id <= 5")
    }
    val msgs = Iterator.iterate(err: Throwable)(_.getCause)
      .takeWhile(_ != null).map(String.valueOf).mkString("\n")
    assert(msgs.contains("amount_pos"), s"wrong failure: $msgs")
    assert(spark.read.format("arrow").load(dir)
      .filter(col("amount") < 0).count() == 0,
      "violating UPDATE leaked")
    assert(spark.read.format("arrow").load(dir).count() == 50)
    // legal UPDATE and DELETE still work
    spark.sql(s"UPDATE graft.arrow.`$dir` SET amount = 999 WHERE id = 1")
    spark.sql(s"DELETE FROM graft.arrow.`$dir` WHERE id = 2")
    assert(spark.read.format("arrow").load(dir).count() == 49)
  }

  test("add_constraint validates EXISTING rows by default and " +
      "refuses; validate => false skips; drop re-opens the gate") {
    import spark.implicits._
    val dir = fixture("con_validate")
    val err = intercept[Exception] {
      spark.sql(s"CALL graft.system.add_constraint(path => '$dir', " +
        "name => 'small', expr => 'amount < 100')").collect()
    }
    assert(Iterator.iterate(err: Throwable)(_.getCause)
      .takeWhile(_ != null).map(String.valueOf).mkString
      .contains("existing rows"))
    assert(TableConstraints.list(dir).isEmpty)
    spark.sql(s"CALL graft.system.add_constraint(path => '$dir', " +
      "name => 'small', expr => 'amount < 100', " +
      "validate => false)").collect()
    assert(TableConstraints.list(dir) == Seq(("small", "amount < 100")))
    // enforced going forward
    intercept[Exception] {
      Seq((300L, 500L)).toDF("id", "amount")
        .write.format("arrow").mode("append").save(dir)
    }
    spark.sql(s"CALL graft.system.drop_constraint(path => '$dir', " +
      "name => 'small')").collect()
    Seq((300L, 500L)).toDF("id", "amount")
      .write.format("arrow").mode("append").save(dir)
    assert(spark.read.format("arrow").load(dir).count() == 51)
    assert(spark.sql(s"CALL graft.system.show_constraints(" +
      s"path => '$dir')").count() == 0)
  }

  test("set_not_null validates existing rows, then every writer path " +
      "rejects NULLs pre-commit; drop_not_null disarms") {
    import spark.implicits._
    // NULLABLE measure column (unlike the shared fixture): declared
    // nullability must come from the constraint, not the schema —
    // Spark's own AssertNotNull on a non-nullable field would mask
    // whether OUR gate fires
    val dir = Files.createTempDirectory("con_notnull").toString
    (1 to 50).map(i => (i.toLong, Option(i * 10L)))
      .toDF("id", "amount")
      .coalesce(1)
      .write.format("arrow").mode("overwrite").save(dir)
    ArrowDataSource.initTableLog(dir)
    // a clean column declares (metadata pass over footer null counts)
    spark.sql(s"CALL graft.system.set_not_null(path => '$dir', " +
      "col => 'amount')").collect()
    assert(TableConstraints.list(dir)
      .exists(_._1 == TableConstraints.notNullName("amount")))
    // a NULL row aborts ATOMICALLY before its epoch commits — unlike a
    // CHECK, where NULL passes (three-valued semantics)
    val root = Paths.get(dir).toAbsolutePath.normalize
    val epochBefore = ArrowDataSource.latestCommittedEpoch(root)
    intercept[Exception] {
      Seq((100L, Some(5L)), (101L, None: Option[Long]))
        .toDF("id", "amount")
        .write.format("arrow").mode("append").save(dir)
    }
    assert(ArrowDataSource.latestCommittedEpoch(root) == epochBefore,
      "violating epoch must not commit")
    assert(spark.read.format("arrow").load(dir).count() == 50)
    // the CoW UPDATE path is gated too
    intercept[Exception] {
      spark.sql(s"UPDATE graft.arrow.`$dir` SET amount = NULL " +
        "WHERE id = 1")
    }
    // dropping disarms
    spark.sql(s"CALL graft.system.drop_not_null(path => '$dir', " +
      "col => 'amount')").collect()
    Seq((102L, None: Option[Long])).toDF("id", "amount")
      .write.format("arrow").mode("append").save(dir)
    assert(spark.read.format("arrow").load(dir)
      .filter(col("amount").isNull).count() == 1)
  }

  test("set_not_null refuses a column holding NULLs, a column evolution " +
      "added WITHOUT a default, and honors one added WITH a default") {
    import spark.implicits._
    val dir = Files.createTempDirectory("con_notnull_evo").toString
    (1 to 50).map(i => (i.toLong, Option(i * 10L)))
      .toDF("id", "amount")
      .coalesce(1)
      .write.format("arrow").mode("overwrite").save(dir)
    ArrowDataSource.initTableLog(dir)
    // seed a NULL into a nullable column
    Seq((100L, None: Option[Long])).toDF("id", "amount")
      .write.format("arrow").mode("append").save(dir)
    val e1 = intercept[Exception] {
      spark.sql(s"CALL graft.system.set_not_null(path => '$dir', " +
        "col => 'amount')").collect()
    }
    assert(e1.getMessage.contains("NULL"),
      s"wrong refusal: ${e1.getMessage}")
    // a column added without a default reads NULL in pre-add files:
    // declaring it NOT NULL must refuse (the evolution interplay)
    spark.sql(s"CALL graft.system.add_column(path => '$dir', " +
      "name => 'tag', type => 'string')").collect()
    intercept[Exception] {
      spark.sql(s"CALL graft.system.set_not_null(path => '$dir', " +
        "col => 'tag')").collect()
    }
    // with an INITIAL default, pre-add rows read the default — clean
    spark.sql(s"CALL graft.system.add_column(path => '$dir', " +
      "name => 'src', type => 'string', default => \"'legacy'\")")
      .collect()
    spark.sql(s"CALL graft.system.set_not_null(path => '$dir', " +
      "col => 'src')").collect()
    // and a write omitting a NOT NULL column fails at bind time
    // (schema-merge appends cannot sneak nulls in)
    intercept[Exception] {
      Seq((200L, 5L)).toDF("id", "amount")
        .write.format("arrow").mode("append").save(dir)
    }
  }

  test("malformed, non-boolean, unknown-column, and duplicate " +
      "constraints refuse at definition time") {
    val dir = fixture("con_bad")
    def addFails(name: String, e: String): Unit = {
      val err = intercept[Exception] {
        spark.sql(s"CALL graft.system.add_constraint(path => '$dir', " +
          s"name => '$name', expr => '$e')").collect()
      }
      assert(err != null)
      ()
    }
    addFails("bad_col", "nope > 0")
    addFails("not_bool", "amount + 1")
    addFails("not_det", "rand() > 0.5")
    spark.sql(s"CALL graft.system.add_constraint(path => '$dir', " +
      "name => 'ok', expr => 'id >= 1')").collect()
    addFails("ok", "id >= 1") // duplicate name
    assert(TableConstraints.list(dir).map(_._1) == Seq("ok"))
  }

  test("the streaming sink enforces per epoch: a violating micro-batch " +
      "fails its epoch and commits nothing") {
    import spark.implicits._
    val src = Files.createTempDirectory("con_stream_src").toString
    val dst = Files.createTempDirectory("con_stream_dst").toString
    val ckpt = Files.createTempDirectory("con_stream_ckpt").toString
    // sink dir must exist as a logged... streaming sink: constraints
    // attach to the sink's metadata dir after the first epoch — create
    // the constraint file up front via a tiny pre-seeded sink
    (1 to 1).map(i => (1L, 1L)).toDF("id", "amount").coalesce(1)
      .write.format("arrow").mode("append").save(dst)
    ArrowDataSource.initTableLog(dst)
    spark.sql(s"CALL graft.system.add_constraint(path => '$dst', " +
      "name => 'amount_pos', expr => 'amount > 0')").collect()
    // constraints live in table-log metadata; streaming into a table
    // log refuses by design, so enforcement rides the BATCH appends of
    // foreachBatch — the streaming-pipeline shape that composes with
    // the epoch protocol
    (2 to 4).map(i => (i.toLong, i * 1L)).toDF("id", "amount")
      .coalesce(1).write.format("arrow").mode("overwrite")
      .save(src)
    val q = spark.readStream.format("arrow").load(src)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.write.format("arrow").mode("append").save(dst)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.read.format("arrow").load(dst).count() == 4)
    // now poison the source; the epoch must fail and commit nothing
    Seq((9L, -5L)).toDF("id", "amount").coalesce(1)
      .write.format("arrow").mode("append").save(src)
    val q2 = spark.readStream.format("arrow").load(src)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.write.format("arrow").mode("append").save(dst)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    intercept[Exception] {
      try q2.processAllAvailable() finally q2.stop()
    }
    assert(spark.read.format("arrow").load(dst).count() == 4,
      "violating micro-batch leaked into the sink")
  }

  test("a write addressed at a partition SUBDIRECTORY of a " +
      "constrained table still enforces the table's constraints") {
    import spark.implicits._
    val dir = Files.createTempDirectory("con_subdir").toString
    (1 to 40).map(i => (i.toLong, i * 10L, s"p${i % 2}"))
      .toDF("id", "amount", "part")
      .write.format("arrow").partitionBy("part")
      .mode("overwrite").save(dir)
    ArrowDataSource.initTableLog(dir)
    spark.sql(s"CALL graft.system.add_constraint(path => '$dir', " +
      "name => 'amount_pos', expr => 'amount > 0')").collect()
    // constraints must resolve through the SINK ROOT — addressed at
    // dir/part=p1 the writer would otherwise find no _constraints
    // file and silently skip enforcement
    val err = intercept[Exception] {
      Seq((900L, -5L)).toDF("id", "amount")
        .write.format("arrow").mode("append").save(s"$dir/part=p1")
    }
    val msgs = Iterator.iterate(err: Throwable)(_.getCause)
      .takeWhile(_ != null).map(String.valueOf).mkString("\n")
    assert(msgs.contains("amount_pos"),
      s"subdirectory write bypassed CHECK enforcement: $msgs")
    assert(spark.read.format("arrow").load(dir)
      .filter(col("id") === 900L).count() == 0,
      "violating subdirectory write leaked rows")
    // a valid subdirectory write still lands
    Seq((901L, 5L)).toDF("id", "amount")
      .write.format("arrow").mode("append").save(s"$dir/part=p1")
    assert(spark.read.format("arrow").load(dir)
      .filter(col("id") === 901L).count() == 1)
  }

  test("overwrite addressed at a partition SUBDIRECTORY of a logged " +
      "table replaces exactly that partition in one atomic epoch") {
    import spark.implicits._
    val dir = Files.createTempDirectory("part_ow").toString
    (1 to 40).map(i => (i.toLong, i * 10L, s"p${i % 2}"))
      .toDF("id", "amount", "part")
      .write.format("arrow").partitionBy("part")
      .mode("overwrite").save(dir)
    ArrowDataSource.initTableLog(dir)
    val root = Paths.get(dir).toAbsolutePath.normalize
    val before = ArrowDataSource.latestCommittedEpoch(root)
    // replace p1's contents wholesale; p0 must be untouched
    Seq((500L, 7L), (501L, 9L)).toDF("id", "amount")
      .write.format("arrow").mode("overwrite").save(s"$dir/part=p1")
    assert(ArrowDataSource.latestCommittedEpoch(root) == before + 1,
      "partition overwrite must be ONE table epoch at the sink root, " +
        "not a nested log")
    assert(!Files.isDirectory(root.resolve("part=p1")
      .resolve(ArrowDataSource.MetadataDirName)))
    val now = spark.read.format("arrow").load(dir)
    assert(now.filter(col("part") === "p0").count() == 20,
      "sibling partition churned by a scoped overwrite")
    assert(now.filter(col("part") === "p1")
      .select(col("id")).as[Long].collect().sorted.toSeq ==
      Seq(500L, 501L))
    // and the epoch is time-travelable: the pre-overwrite p1 resolves
    spark.conf.set("spark.sql.catalog.graft",
      classOf[GraftCatalog].getName)
    val old = spark.sql(
      s"SELECT * FROM graft.arrow.`$dir` VERSION AS OF $before")
    assert(old.filter(col("part") === "p1").count() == 20,
      "pre-overwrite partition lost from version history")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.arrow.{ArrowDataSource, GraftCatalog}

/** Randomized ACID history check: apply a random sequence of DML
  * operations (DELETE / UPDATE / INSERT / OPTIMIZE / RESTORE) to a
  * logged table, snapshot the expected row set after each committed
  * epoch, then re-read EVERY epoch via `VERSION AS OF` and demand
  * bit-exact equality. One wrong manifest fold, remove event, restore
  * rewrite, or maintenance epoch leak breaks some version — the
  * random walk hunts interleavings a hand-written script misses. */
class TimeTravelPropertySpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSession.spark
    s.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    s
  }

  test("a 14-step random DML walk: every committed epoch re-reads " +
      "exactly as the state recorded when it was the head") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("tt_prop").toString
    (1 to 300).map(i => (i.toLong, (i % 7).toLong, s"t$i"))
      .toDF("id", "grp", "tag")
      .repartition(3)
      .write.format("arrow").mode("overwrite").save(dir)
    ArrowDataSource.initTableLog(dir)
    val root = java.nio.file.Paths.get(dir).toAbsolutePath.normalize

    def state(): Set[String] = spark.read.format("arrow").load(dir)
      .collect().map(_.toString).toSet
    val byEpoch = scala.collection.mutable.Map[Long, Set[String]](
      ArrowDataSource.latestCommittedEpoch(root) -> state())

    val params = Gen.Parameters.default
    var seed = Seed(2024L)
    var nextId = 1000L
    val opGen: Gen[Int] = Gen.frequency(
      3 -> 0 /*delete*/, 3 -> 1 /*update*/, 3 -> 2 /*insert*/,
      1 -> 3 /*optimize*/, 1 -> 4 /*restore*/)
    for (step <- 1 to 14) {
      val op = opGen.pureApply(params, seed); seed = seed.next
      val g = Gen.choose(0, 6).pureApply(params, seed); seed = seed.next
      val lo = Gen.choose(0L, 1200L).pureApply(params, seed)
      seed = seed.next
      op match {
        case 0 =>
          spark.sql(s"DELETE FROM graft.arrow.`$dir` " +
            s"WHERE grp = $g AND id >= $lo AND id < ${lo + 150}")
        case 1 =>
          spark.sql(s"UPDATE graft.arrow.`$dir` SET tag = " +
            s"concat(tag, '_u$step') WHERE grp = $g AND id < $lo")
        case 2 =>
          spark.sql(s"INSERT INTO graft.arrow.`$dir` VALUES " +
            (0 until 20).map(j =>
              s"(${nextId + j}, ${(j % 7)}, 'n${step}_$j')")
              .mkString(", "))
          nextId += 100
        case 3 =>
          spark.sql(s"CALL graft.system.compact(path => '$dir', " +
            "target_rows => 200)").collect()
        case 4 =>
          // roll back to a random PAST epoch, then continue mutating
          val eps = byEpoch.keys.toSeq.sorted
          val tgt = eps(
            Gen.choose(0, eps.size - 1).pureApply(params, seed))
          seed = seed.next
          spark.sql(s"CALL graft.system.restore(path => '$dir', " +
            s"epoch => $tgt)").collect()
      }
      byEpoch(ArrowDataSource.latestCommittedEpoch(root)) = state()
    }

    // every recorded epoch must re-read exactly — maintenance and
    // restore epochs included (compaction is data-neutral; restore's
    // head state equals the restored epoch's state)
    for ((e, expected) <- byEpoch.toSeq.sortBy(_._1)) {
      val got = spark.sql(
        s"SELECT * FROM graft.arrow.`$dir` VERSION AS OF $e")
        .collect().map(_.toString).toSet
      assert(got == expected,
        s"VERSION AS OF $e diverged from the state recorded when " +
          s"epoch $e was the head: missing=${(expected -- got).take(3)} " +
          s"extra=${(got -- expected).take(3)}")
    }
  }
}

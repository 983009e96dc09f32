package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.arrow.ArrowDataSource

/** Child-process entry for [[CrossJvmLogSpec]]: commits `n` one-file
  * append epochs to the table at `dir` under the optimistic-concurrency
  * protocol (exclusive-create epoch reservation + blind-append rebase),
  * racing whatever other PROCESS is doing the same. No SparkSession —
  * the contract under test is the commit-log layer itself, and keeping
  * the child lean makes the race window tight instead of being
  * dominated by JVM+Spark startup skew. */
object CrossJvmLogRacer {
  def main(args: Array[String]): Unit = {
    val (dir, tag, n) = (args(0), args(1), args(2).toInt)
    commitMany(dir, tag, n)
    println(s"RACER_DONE $tag")
  }

  def commitMany(dir: String, tag: String, n: Int): Unit = {
    val root = Paths.get(dir).toAbsolutePath.normalize
    (1 to n).foreach { i =>
      val f = root.resolve(s"${tag}_$i.arrow")
      Files.write(f, Array[Byte](65, 82, 82, 79, 87, 49))
      val base = ArrowDataSource.latestCommittedEpoch(root)
      ArrowDataSource.commitAppendWithRebase(dir, base,
        Seq(f.toString), maxRetries = 500)
    }
  }
}

/** The optimistic-concurrency claim held only as far as it was tested:
  * ArrowTableLogSpec races 8 writers in ONE JVM, where the filesystem
  * calls share a process. This spec races two PROCESSES on one table —
  * the exclusive-create manifest reservation (Files.createFile) and
  * blind-append rebase must serialize commits across JVMs with no lost
  * epoch and no lost add, which is exactly the multi-writer story a
  * shared table on a real cluster depends on. */
class CrossJvmLogSpec extends AnyFunSuite {

  test("three JVMs racing blind appends on one table: every commit " +
      "lands, no epoch or add is lost, mid-read compaction sweeps " +
      "are survived, the log folds cleanly") {
    val dir = Files.createTempDirectory("xjvm_log").toString
    ArrowDataSource.initTableLog(dir)
    val root = Paths.get(dir).toAbsolutePath.normalize
    val n = 50 // crosses many compaction intervals: each process's
    // fold SWEEPS covered manifests/.ts markers while the others are
    // mid-read — the window that crashed log reads before
    // retryVanishedLogRead (NoSuchFileException on a .ts marker,
    // reproduced 6/6 under this load pre-fix)

    val java = Paths.get(System.getProperty("java.home"), "bin", "java")
      .toString
    val cp = System.getProperty("java.class.path")
    val kids = Seq("c1", "c2").map { tag =>
      new ProcessBuilder(
        java, "-cp", cp, "graft.CrossJvmLogRacer", dir, tag, n.toString)
        .redirectErrorStream(true).start()
    }
    // parent races in-thread while both children run
    CrossJvmLogRacer.commitMany(dir, "parent", n)
    kids.foreach { child =>
      val out = new String(child.getInputStream.readAllBytes, "UTF-8")
      assert(child.waitFor() == 0, s"child JVM failed:\n$out")
      assert(out.contains("RACER_DONE"), s"child never finished:\n$out")
    }

    // every commit landed as its own epoch: 3n epochs after the init
    // snapshot, none skipped, none double-numbered (createFile on the
    // manifest name is the cross-process mutex)
    assert(ArrowDataSource.latestCommittedEpoch(root) == 3L * n,
      "a racing commit overwrote or skipped an epoch")
    // every add from all three processes is visible exactly once
    val visible = ArrowDataSource.visibleIpcFiles(dir)
      .map(_.getFileName.toString).sorted
    val expected = ((1 to n).map(i => s"parent_$i.arrow") ++
      (1 to n).map(i => s"c1_$i.arrow") ++
      (1 to n).map(i => s"c2_$i.arrow")).sorted
    assert(visible == expected,
      s"lost/duplicated adds across JVMs: got ${visible.size}, " +
        s"missing ${expected.toSet -- visible.toSet}, " +
        s"extra ${visible.toSet -- expected.toSet}")
    // and the log compacts without losing any of it (2n epochs crossed
    // several compaction intervals during the race)
    ArrowDataSource.compactLog(root,
      ArrowDataSource.latestCommittedEpoch(root))
    val afterCompact = ArrowDataSource.visibleIpcFiles(dir)
      .map(_.getFileName.toString).sorted
    assert(afterCompact == expected,
      "compaction after the cross-JVM race changed the visible set")
  }

  test("a stale-base REMOVE epoch planned before another PROCESS " +
      "committed fails fast instead of landing on the moved table") {
    val dir = Files.createTempDirectory("xjvm_stale").toString
    ArrowDataSource.initTableLog(dir)
    val root = Paths.get(dir).toAbsolutePath.normalize
    CrossJvmLogRacer.commitMany(dir, "seed", 2)
    val plannedBase = ArrowDataSource.latestCommittedEpoch(root)
    val victim = root.resolve("seed_1.arrow").toString

    // another JVM commits while our remove epoch is 'in flight'
    val javaBin = Paths
      .get(System.getProperty("java.home"), "bin", "java").toString
    val child = new ProcessBuilder(
      javaBin, "-cp", System.getProperty("java.class.path"),
      "graft.CrossJvmLogRacer", dir, "interloper", "1")
      .redirectErrorStream(true).start()
    assert(child.waitFor() == 0)

    // removes are NOT blind appends: the snapshot this delete planned
    // against is gone, so the commit must refuse (cross-process
    // optimistic concurrency), never silently drop the interloper
    intercept[java.util.ConcurrentModificationException] {
      ArrowDataSource.commitTableEpoch(dir, plannedBase,
        Seq.empty, Seq(victim))
    }
    // re-planned against the CURRENT state it lands
    val nowBase = ArrowDataSource.latestCommittedEpoch(root)
    ArrowDataSource.commitTableEpoch(dir, nowBase, Seq.empty, Seq(victim))
    val visible = ArrowDataSource.visibleIpcFiles(dir)
      .map(_.getFileName.toString).toSet
    assert(!visible.contains("seed_1.arrow"))
    assert(visible.contains("interloper_1.arrow"),
      "the other process's commit was lost")
  }
}

package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.arrow.{ArrowDataSource, ArrowOptimize}

/** VACUUM reclaims the space readers already cannot see: crashed-writer
  * `.inprogress` temps anywhere, and — under a streaming sink — `.arrow`
  * files no committed manifest lists. Visible data is never touched,
  * and the grace window protects an in-flight epoch's just-renamed
  * files. */
class ArrowVacuumSpec extends AnyFunSuite {

  test("sink orphans and stale temps go; committed files stay") {
    val dir = Files.createTempDirectory("vac_sink").toString
    val committed = Paths.get(dir, "part-00000-live.arrow")
    val orphan = Paths.get(dir, "part-00001-orphan.arrow")
    val temp = Paths.get(dir, "part-00002-x.arrow.inprogress")
    Files.write(committed, Array[Byte](1))
    Files.write(orphan, Array[Byte](2))
    Files.write(temp, Array[Byte](3))
    ArrowDataSource.commitEpochManifest(dir, 0L, Seq(committed.toString))

    // dry run first: reports the same victims, touches NOTHING
    val would = ArrowOptimize.vacuum(dir, graceMs = 0, dryRun = true)
    assert(would.map(_.getFileName.toString).toSet ==
      Set(orphan.getFileName.toString, temp.getFileName.toString))
    assert(Files.exists(orphan) && Files.exists(temp),
      "dry run deleted files")

    val deleted = ArrowOptimize.vacuum(dir, graceMs = 0)
    assert(deleted.map(_.getFileName.toString).toSet ==
      Set(orphan.getFileName.toString, temp.getFileName.toString))
    assert(Files.exists(committed), "committed file must survive")
    assert(!Files.exists(orphan) && !Files.exists(temp))
    assert(ArrowDataSource.visibleIpcFiles(dir).map(_.toString) ==
      Seq(committed.toString), "reader view unchanged")
  }

  test("the grace window shields young files from the in-flight race") {
    val dir = Files.createTempDirectory("vac_grace").toString
    val committed = Paths.get(dir, "part-00000-live.arrow")
    val young = Paths.get(dir, "part-00001-young.arrow")
    Files.write(committed, Array[Byte](1))
    Files.write(young, Array[Byte](2)) // renamed, manifest not yet landed
    ArrowDataSource.commitEpochManifest(dir, 0L, Seq(committed.toString))
    val deleted = ArrowOptimize.vacuum(dir) // default 1h grace
    assert(deleted.isEmpty, s"nothing is old enough, got $deleted")
    assert(Files.exists(young))
  }

  test("flat directories sweep only temps — every .arrow is live") {
    val dir = Files.createTempDirectory("vac_flat").toString
    val live = Paths.get(dir, "part-00000-live.arrow")
    val temp = Paths.get(dir, "part-00001-x.arrow.inprogress")
    Files.write(live, Array[Byte](1))
    Files.write(temp, Array[Byte](2))
    val deleted = ArrowOptimize.vacuum(dir, graceMs = 0)
    assert(deleted == Seq(temp))
    assert(Files.exists(live))
  }
}

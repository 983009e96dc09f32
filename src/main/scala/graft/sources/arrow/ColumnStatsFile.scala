package graft.sources.arrow

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardCopyOption}

/** ANALYZE-style table-level column statistics the footers cannot
  * carry: nulls and min/max fold from per-file footer stats, but
  * DISTINCT-VALUE counts (NDV) do not — merging per-file NDVs
  * over-counts shared values. `CALL graft.system.analyze(path)` runs
  * one approx_count_distinct pass over the table and persists the
  * results here; [[ArrowScan.estimateStatistics]] serves them to
  * Catalyst as `ColumnStatistics.distinctCount`, which is what the
  * CBO's join-cardinality and aggregate-output estimates key on. At
  * 100 TB that estimate is the difference between planning a
  * fact-fact join as an explosion or a reduction.
  *
  * Estimates, never correctness: stale NDVs (the table grew since
  * ANALYZE) still inform the optimizer; re-run analyze to refresh.
  * Format: `rows<TAB>n` header then `col<TAB>ndv` lines, atomically
  * replaced. */
object ColumnStatsFile {
  val FileName = "_graft_column_stats"

  private def file(root: Path): Path = root.resolve(FileName)

  def write(root: Path, rows: Long, ndv: Seq[(String, Long)]): Unit = {
    val body = (s"rows\t$rows" +:
      ndv.map { case (c, n) =>
        s"${java.util.Base64.getEncoder.encodeToString(
          c.getBytes(StandardCharsets.UTF_8))}\t$n"
      }).mkString("\n")
    // uuid-suffixed temp: two concurrent ANALYZE calls must not race
    // on one staging name (last move wins either way — both are valid)
    val tmp = root.resolve(FileName + "." +
      java.util.UUID.randomUUID().toString.take(8) + ".inprogress")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, file(root), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** (rowsAtAnalyze, col → ndv), None when never analyzed. */
  def load(root: Path): Option[(Long, Map[String, Long])] =
    try {
      if (!Files.exists(file(root))) None
      else {
        import scala.jdk.CollectionConverters._
        val lines = Files.readAllLines(file(root)).asScala
        val rows = lines.headOption.collect {
          case l if l.startsWith("rows\t") => l.substring(5).toLong
        }.getOrElse(return None)
        val ndv = lines.drop(1).flatMap(_.split('\t') match {
          case Array(c64, n) => Some(new String(
            java.util.Base64.getDecoder.decode(c64),
            StandardCharsets.UTF_8) -> n.toLong)
          case _ => None
        }).toMap
        Some((rows, ndv))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
}

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
  * Format: `rows<TAB>n` header then `col<TAB>ndv` lines, then optional
  * `h<TAB>col<TAB>height<TAB>lo:hi:ndv;…` EQUI-HEIGHT HISTOGRAM lines
  * (`analyze(histogram => true)`) — the selectivity input for skewed
  * predicates, where a flat NDV assumes uniformity and misestimates a
  * hot key by orders of magnitude. Atomically replaced. */
object ColumnStatsFile {
  val FileName = "_graft_column_stats"

  /** One equi-height histogram: ~rows/bins rows per bin, each bin
    * `(lo, hi, ndv)` in the column's double-coerced domain (Catalyst's
    * `HistogramBin` shape). */
  final case class Hist(height: Double, bins: Seq[(Double, Double, Long)])

  private def file(root: Path): Path = root.resolve(FileName)

  def write(root: Path, rows: Long, ndv: Seq[(String, Long)],
      hists: Seq[(String, Hist)] = Seq.empty): Unit = {
    def b64(c: String): String = java.util.Base64.getEncoder
      .encodeToString(c.getBytes(StandardCharsets.UTF_8))
    val body = ((s"rows\t$rows" +:
      ndv.map { case (c, n) => s"${b64(c)}\t$n" }) ++
      hists.map { case (c, h) =>
        val bins = h.bins.map { case (lo, hi, n) => s"$lo:$hi:$n" }
          .mkString(";")
        s"h\t${b64(c)}\t${h.height}\t$bins"
      }).mkString("\n")
    // uuid-suffixed temp: two concurrent ANALYZE calls must not race
    // on one staging name (last move wins either way — both are valid)
    val tmp = root.resolve(FileName + "." +
      java.util.UUID.randomUUID().toString.take(8) + ".inprogress")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, file(root), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** ONE read + parse serving both statistic classes:
    * (rowsAtAnalyze, col → ndv, col → histogram); None when never
    * analyzed. NDV lines and histogram lines parse independently, so a
    * stats file from before histograms existed (or one whose histogram
    * line is malformed) still serves its NDVs. Planning calls this
    * once per scan — the sidecar must not be read twice per plan. */
  def loadAll(root: Path)
      : Option[(Long, Map[String, Long], Map[String, Hist])] =
    try {
      if (!Files.exists(file(root))) None
      else {
        import scala.jdk.CollectionConverters._
        val lines = Files.readAllLines(file(root)).asScala
        val rows = lines.headOption.collect {
          case l if l.startsWith("rows\t") => l.substring(5).toLong
        }.getOrElse(return None)
        def unb(c64: String): String = new String(
          java.util.Base64.getDecoder.decode(c64),
          StandardCharsets.UTF_8)
        val ndv = lines.drop(1).flatMap(_.split('\t') match {
          case Array(c64, n) => Some(unb(c64) -> n.toLong)
          case _ => None
        }).toMap
        val hists = lines.drop(1).flatMap(_.split('\t') match {
          case Array("h", c64, height, bins) =>
            try {
              val bs = bins.split(';').toSeq.filter(_.nonEmpty)
                .map { b =>
                  val p = b.split(':')
                  (p(0).toDouble, p(1).toDouble, p(2).toLong)
                }
              if (bs.isEmpty) None
              else Some(unb(c64) -> Hist(height.toDouble, bs))
            } catch { case scala.util.control.NonFatal(_) => None }
          case _ => None
        }).toMap
        Some((rows, ndv, hists))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** (rowsAtAnalyze, col → ndv), None when never analyzed. */
  def load(root: Path): Option[(Long, Map[String, Long])] =
    loadAll(root).map { case (r, n, _) => (r, n) }

  /** col → equi-height histogram, empty when never computed. */
  def loadHistograms(root: Path): Map[String, Hist] =
    loadAll(root).map(_._3).getOrElse(Map.empty)
}

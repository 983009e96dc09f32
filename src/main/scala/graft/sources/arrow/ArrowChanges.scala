package graft.sources.arrow

import java.nio.file.Paths

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.lit

/** Change feed over the table log (Delta CDF's batch shape): row-level
  * changes between two committed epochs, computed from CHURNED FILES
  * ONLY — never a full-table diff.
  *
  * The log makes the file algebra exact: with `C` the files live at
  * both epochs, `A` the files added in the window, and `R` the files
  * removed, the row multisets satisfy `V_to = V_C + V_A` and
  * `V_from = V_C + V_R`, so
  *
  *   inserts = V_A \ V_R   and   deletes = V_R \ V_A   (multiset \)
  *
  * — the shared-file term cancels WITHOUT being read. Copy-on-write
  * rewrites carry unchanged rows into both `A` and `R`, where the
  * `exceptAll` annihilates them, leaving exactly the rows DML touched.
  * At 100 TB the cost is O(churned bytes) to scan and one exchange
  * over churned rows for the anti-diff: a day of DML against a
  * petabyte table reads the day's files, not the petabyte.
  *
  * An UPDATE therefore surfaces as (delete old-values, insert
  * new-values) — CDC's upsert pair; downstream keys them however the
  * table is keyed. Removed files are still on disk until vacuum (the
  * same invariant `VERSION AS OF` rests on), so `from` must be at or
  * past the vacuum horizon. */
object ArrowChanges {

  val ChangeTypeCol = "_change_type"

  /** Rows changed in epoch window `(from, to]` of the logged table at
    * `path`, tagged insert/delete in [[ChangeTypeCol]]. `from == to`
    * yields an empty frame with the right schema. */
  def between(spark: SparkSession, path: String, from: Long,
      to: Long): DataFrame = {
    val root = Paths.get(path).toAbsolutePath.normalize
    require(ArrowDataSource.sinkRoot(path).isDefined,
      s"table_changes: $path carries no commit log to diff over")
    val latest = ArrowDataSource.latestCommittedEpoch(root)
    require(from >= 0 && to <= latest && from <= to,
      s"table_changes: window ($from, $to] out of range — $path has " +
        s"committed epochs 0..$latest")
    val horizon = ArrowDataSource.travelHorizon(root)
    require(from >= horizon,
      s"table_changes: epoch $from of $path predates the vacuum " +
        s"horizon $horizon — removed files of that window were " +
        s"reclaimed; earliest diffable epoch is $horizon")
    val fromSet = ArrowDataSource.liveEntries(root, Some(from))
      .map(_._2).toSet
    val toSet = ArrowDataSource.liveEntries(root, Some(to))
      .map(_._2).toSet
    val added = (toSet -- fromSet).toSeq.sorted
    val removed = (fromSet -- toSet).toSeq.sorted
    val schema = spark.read.format("arrow").load(path).schema
    def readFiles(rels: Seq[String]): DataFrame =
      if (rels.isEmpty)
        spark.createDataFrame(new java.util.ArrayList[Row](), schema)
      else spark.read.format("arrow").schema(schema)
        .option("files", rels.mkString(",")).load(path)
    val a = readFiles(added)
    val r = readFiles(removed)
    a.exceptAll(r).withColumn(ChangeTypeCol, lit("insert"))
      .unionAll(r.exceptAll(a).withColumn(ChangeTypeCol, lit("delete")))
  }
}

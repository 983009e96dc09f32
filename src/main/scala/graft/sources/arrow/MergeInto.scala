package graft.sources.arrow

import org.apache.spark.sql.{DataFrame, SparkSession}

/** MERGE INTO with schema evolution — Delta's `withSchemaEvolution`
  * ergonomic for arrow tables: a CDC source carrying columns the
  * target has never seen auto-evolves the target BEFORE the row-level
  * rewrite, so `UPDATE SET *` / `INSERT *` resolve against the
  * evolved schema instead of failing analysis.
  *
  * The evolution is [[GraftProcedures.mergeWriteSchema]] verbatim —
  * the same invariants as the writer's `option("mergeSchema", true)`:
  * new columns land nullable, struct columns merge field-wise,
  * dropped/renamed names refuse to resurrect, type conflicts and case
  * variants refuse loudly. It must run before the MERGE is ANALYZED
  * (Spark resolves the star actions against the table's current
  * schema), which is why this is a driver-side helper around the SQL
  * statement rather than a write option: by the time a write option
  * could act, analysis has already failed.
  *
  * Read-path composition is what makes the evolution metadata-only:
  * the CoW path rewrites ONLY the files runtime group filtering
  * proves hold matches — their replacement files materialize the new
  * column (nulls for carried-over rows); every untouched file simply
  * predates the column and serves it as null through the by-name
  * reader. The delta (deletion-vector) path rewrites nothing at all —
  * its insert files carry the column, everything else null-fills.
  */
object MergeInto {

  /** Evolve `path`'s declared schema to the union with `source`'s,
    * register `source` under `sourceView`, run `mergeSql`, drop the
    * view. The MERGE statement itself stays the caller's — any arm
    * combination works; only the schema evolution is added. */
  def withSchemaEvolution(spark: SparkSession, path: String,
      source: DataFrame, sourceView: String, mergeSql: String): Unit = {
    GraftProcedures.mergeWriteSchema(path, source.schema, Set.empty)
    source.createOrReplaceTempView(sourceView)
    try { spark.sql(mergeSql); () }
    finally { spark.catalog.dropTempView(sourceView); () }
  }
}

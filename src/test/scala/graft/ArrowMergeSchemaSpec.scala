package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Read-side schema evolution for the Arrow source
  * (`option("mergeSchema", true)`, parquet's contract): the table
  * schema is the union of every footer schema, files missing a column
  * serve it as nulls, and true type conflicts refuse loudly. Without
  * the option a mixed-schema directory still fails fast — evolution is
  * an explicit opt-in, not a silent default. */
class ArrowMergeSchemaSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  /** Two generations: old files (id, v), new files (id, v, extra). */
  private def evolvedDir(): String = {
    val dir = Files.createTempDirectory("arrow_merge").toString
    Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
      .coalesce(1).write.format("arrow").mode("overwrite").save(dir)
    Seq((3L, 30.0, "x"), (4L, 40.0, "y")).toDF("id", "v", "extra")
      .coalesce(1).write.format("arrow").mode("append").save(dir)
    dir
  }

  test("without mergeSchema a mixed directory fails fast") {
    val dir = evolvedDir()
    val e = intercept[Exception] {
      spark.read.format("arrow").load(dir).collect()
    }
    assert(e.getMessage.contains("inconsistent schema"), e.getMessage)
  }

  test("mergeSchema unions the schemas and null-fills missing columns") {
    val dir = evolvedDir()
    val df = spark.read.format("arrow").option("mergeSchema", "true")
      .load(dir)
    assert(df.schema.fieldNames.toSeq == Seq("id", "v", "extra"))
    val rows = df.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), Option(r.getString(2))))
    assert(rows.toSeq == Seq(
      (1L, 10.0, None), (2L, 20.0, None),
      (3L, 30.0, Some("x")), (4L, 40.0, Some("y"))))
  }

  test("aggregates and filters over the evolved column are exact") {
    val dir = evolvedDir()
    val df = spark.read.format("arrow").option("mergeSchema", "true")
      .load(dir)
    // count(col) must see exactly the new generation's non-null rows
    assert(df.agg(count(col("extra"))).collect()(0).getLong(0) == 2L)
    assert(df.filter(col("extra").isNull).count() == 2L)
    assert(df.filter(col("extra") === "x").select("id")
      .collect().map(_.getLong(0)).toSeq == Seq(3L))
    // and an aggregate over a column every file carries is unaffected
    assert(df.agg(sum(col("v"))).collect()(0).getDouble(0) == 100.0)
  }

  test("projection of only evolved columns stays columnar") {
    val dir = evolvedDir()
    val df = spark.read.format("arrow").option("mergeSchema", "true")
      .load(dir).select("extra")
    assert(df.collect().map(r => Option(r.getString(0))).toSet ==
      Set(None, Some("x"), Some("y")))
  }

  test("a true type conflict refuses to merge") {
    val dir = Files.createTempDirectory("arrow_merge_conflict").toString
    Seq((1L, 10.0)).toDF("id", "v")
      .write.format("arrow").mode("overwrite").save(dir)
    Seq((2L, "not a double")).toDF("id", "v")
      .write.format("arrow").mode("append").save(dir)
    val e = intercept[IllegalArgumentException] {
      spark.read.format("arrow").option("mergeSchema", "true").load(dir)
    }
    assert(e.getMessage.contains("type conflicts"), e.getMessage)
  }

  test("mergeSchema composes with partitioned layouts") {
    val dir = Files.createTempDirectory("arrow_merge_part").toString
    Seq((1L, "a")).toDF("id", "part")
      .write.format("arrow").partitionBy("part")
      .mode("overwrite").save(dir)
    Seq((2L, 5L, "b")).toDF("id", "extra", "part")
      .write.format("arrow").partitionBy("part")
      .mode("append").save(dir)
    val df = spark.read.format("arrow").option("mergeSchema", "true")
      .load(dir)
    val rows = df.orderBy("id").collect().map(r =>
      (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)),
        r.getString(2)))
    assert(rows.toSeq == Seq((1L, None, "a"), (2L, Some(5L), "b")))
  }
}

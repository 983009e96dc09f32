package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The full JSON scalar-function family from SURVEY.md §2b (from_json
  * is on the oracle surface via json_kv_agg; the rest are spec-checked
  * here — DuckDB's JSON extension is not guaranteed offline, so these
  * are not oracle queries). */
class JsonFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def props = Tables.events(spark, TestSession.Sf)
    .select(col("event_id"), col("props"))

  test("get_json_object and json_tuple agree with from_json") {
    // json_tuple is a generator — it must be a top-level select item
    val df = props.select(
      col("event_id"),
      from_json(col("props"), "k INT", Map.empty[String, String]).getField("k").as("via_schema"),
      get_json_object(col("props"), "$.k").cast("int").as("via_path"),
      json_tuple(col("props"), "k"))
      .withColumn("via_tuple", col("c0").cast("int"))
    assert(df.filter(
      col("via_schema") =!= col("via_path") ||
        col("via_schema") =!= col("via_tuple")).count() == 0)
    assert(df.filter(col("via_schema").isNotNull).count() > 0)
  }

  test("to_json(from_json(x)) round-trips the parsed fields") {
    val df = props.select(
      col("event_id"),
      from_json(col("props"), "k INT", Map.empty[String, String]).as("parsed"))
      .select(col("event_id"), to_json(col("parsed")).as("rejson"),
        col("parsed").getField("k").as("k"))
    // re-serialized form parses back to the same value
    val back = df.select(col("event_id"), col("k"),
      from_json(col("rejson"), "k INT", Map.empty[String, String]).getField("k").as("k2"))
    assert(back.filter(col("k") =!= col("k2")).count() == 0)
  }

  test("schema_of_json infers the props shape") {
    // schema_of_json needs a foldable literal — sample one value first
    val sample = props.filter(col("props").isNotNull).limit(1)
      .head.getString(1)
    val s = spark.range(1)
      .select(schema_of_json(lit(sample))).head.getString(0)
    assert(s.toLowerCase.contains("k"), s)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** The engine's Catalyst additions resolve from plain SQL in a session
  * built with GraftExtensions (Engine.local uses it), plus small
  * remaining source/set-op coverage: JSON-lines read, unionByName. */
class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("injected functions resolve from SQL without manual registration") {
    val r = spark.sql(
      """SELECT graft_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d,
        |       graft_rolling_hash('hello world') AS h""".stripMargin).head
    assert(r.getDouble(0) == 11.0)
    assert(r.getLong(1) ==
      "hello world".getBytes("UTF-8")
        .foldLeft(7L)((a, b) => (a * 31 + (b & 0xFF)) % 1000000007L))
  }

  test("CollapseSelfDot rewrites graft_dot(x,x) to graft_norm_sq with equal values") {
    import org.apache.spark.sql.functions._
    val df = Tables.embeddings(spark, TestSession.Sf)
      .select(col("vec_id"), col("embedding"),
        expr("graft_dot(embedding, embedding)").as("nsq"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_norm_sq") &&
      !optimized.contains("graft_dot"),
      s"self-dot not collapsed:\n$optimized")
    // bit-transparency: identical to the hand-computed fold
    df.collect().foreach { r =>
      val v = r.getSeq[Float](1)
      val expected = v.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)
      assert(r.getDouble(2) == expected, s"vec ${r.getLong(0)}")
    }
  }

  test("JSON-lines source: write props as text, read back with spark.read.json") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString + "/data"
    Tables.events(spark, TestSession.Sf)
      .select("props").write.mode("overwrite").text(dir)
    val parsed = spark.read.json(dir)
    assert(parsed.schema.fieldNames.contains("k"))
    val totalK = parsed.agg(org.apache.spark.sql.functions.sum("k"))
      .head.getLong(0)
    val expected = Tables.events(spark, TestSession.Sf)
      .selectExpr("CAST(regexp_extract(props, '\"k\":\\\\s*(\\\\d+)', 1) AS LONG) AS k")
      .agg(org.apache.spark.sql.functions.sum("k")).head.getLong(0)
    assert(totalK == expected)
  }

  test("unionByName aligns differently-ordered schemas") {
    import spark.implicits._
    val a = Seq((1L, "x")).toDF("id", "tag")
    val b = Seq(("y", 2L)).toDF("tag", "id")
    val u = a.unionByName(b)
    assert(u.count() == 2)
    assert(u.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
  }
}

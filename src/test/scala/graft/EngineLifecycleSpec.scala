package graft

import org.scalatest.funsuite.AnyFunSuite

/** Lifecycle contracts mirrored from the reference (SURVEY.md §2a):
  * R2 errors-as-values, R4 catalog registration, R5 reset. */
class EngineLifecycleSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("R2: failing evaluation yields a structured error, not a throw") {
    val bad = Engine.evaluate(spark, "/nonexistent/dir", "q1_pricing_summary")
      .flatMap { df =>
        // force execution — analysis errors surface lazily
        try Right(df.count()) catch {
          case e: Throwable => Left(Engine.EngineError("q1", e.toString))
        }
      }
    assert(bad.isLeft)
  }

  test("R2: unknown query name is an error value") {
    assert(Engine.evaluate(spark, TestSession.Sf, "no_such_query").isLeft)
  }

  test("R2/R1: TIMESTAMP_NTZ fixture evaluates through the facade") {
    // regression pin: the driver's events fixture drifted to
    // TIMESTAMP_NTZ and the time-arithmetic queries threw at analysis
    // (r8). With Tables.events normalizing the type, the same queries
    // must come back as Right with rows — and any future fixture drift
    // must surface as Left, never a throw across evaluate().
    for (q <- Seq("events_sessionize", "join_time_bucket")) {
      val r = Engine.evaluate(spark, TestSession.Sf, q)
      assert(r.isRight, s"$q: ${r.left.toOption}")
      assert(r.toOption.get.count() > 0, s"$q returned no rows")
    }
  }

  test("R4/R5: register populates the catalog, reset drops it, "
      + "re-register reproduces results") {
    Engine.register(spark, TestSession.Sf)
    assert(spark.catalog.tableExists("lineitem"))
    val before = spark.sql("SELECT count(*) FROM lineitem").head.getLong(0)
    Engine.reset(spark)
    assert(!spark.catalog.tableExists("lineitem"))
    Engine.register(spark, TestSession.Sf)
    val after = spark.sql("SELECT count(*) FROM lineitem").head.getLong(0)
    assert(before == after && before > 0)
  }
}

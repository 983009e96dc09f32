package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Arrow source failure modes: bad options and paths fail fast with
  * clear messages rather than corrupting or half-writing. */
class ArrowErrorSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("unknown codec fails the write with a naming error") {
    val dir = java.nio.file.Files.createTempDirectory("arrow_err").toString
    val e = intercept[Exception] {
      Tables.load(spark, TestSession.Sf, "region")
        .write.format("arrow").option("codec", "snappy")
        .mode("overwrite").save(dir)
    }
    import TestErrors.messages
    assert(messages(e).exists(_.contains("lz4 or zstd")),
      s"got: ${messages(e)}")
    // failed tasks must not leave partial files behind
    assert(graft.sources.arrow.ArrowDataSource.listIpcFiles(dir).isEmpty)
  }

  test("bucketBy option errors fail fast with naming messages") {
    val region = Tables.load(spark, TestSession.Sf, "region")
    import TestErrors.messages
    def dir() = java.nio.file.Files.createTempDirectory("arrow_bkt_err")
      .toString
    // bucketBy without numBuckets
    val e1 = intercept[Exception] {
      region.write.format("arrow").option("bucketBy", "r_regionkey")
        .mode("overwrite").save(dir())
    }
    assert(messages(e1).exists(_.contains("numBuckets")), messages(e1))
    // bucketBy + partitionBy is unsupported
    val e2 = intercept[Exception] {
      region.write.format("arrow").option("bucketBy", "r_regionkey")
        .option("numBuckets", "4").partitionBy("r_name")
        .mode("overwrite").save(dir())
    }
    assert(messages(e2).exists(_.contains("partitionBy")), messages(e2))
    // unsupported key type (double)
    val e3 = intercept[Exception] {
      Tables.load(spark, TestSession.Sf, "orders")
        .select("o_orderkey", "o_totalprice")
        .write.format("arrow").option("bucketBy", "o_totalprice")
        .option("numBuckets", "4").mode("overwrite").save(dir())
    }
    assert(messages(e3).exists(_.contains("unsupported type")), messages(e3))
    // numBuckets out of range
    val e4 = intercept[Exception] {
      region.write.format("arrow").option("bucketBy", "r_regionkey")
        .option("numBuckets", "0").mode("overwrite").save(dir())
    }
    assert(messages(e4).exists(_.contains("numBuckets")), messages(e4))
  }

  test("reading a directory with no arrow files fails schema inference") {
    val dir = java.nio.file.Files.createTempDirectory("arrow_empty").toString
    val e = intercept[Exception] {
      spark.read.format("arrow").load(dir).count()
    }
    assert(e.getMessage != null)
  }

  test("mixed-schema directories fail fast naming the offending file") {
    val dir = java.nio.file.Files.createTempDirectory("arrow_mixed").toString
    Tables.load(spark, TestSession.Sf, "region")
      .write.format("arrow").mode("append").save(dir)
    // a second writer drifted the schema (names and types differ)
    Tables.load(spark, TestSession.Sf, "nation")
      .write.format("arrow").mode("append").save(dir)
    import TestErrors.messages
    val e = intercept[Exception] {
      spark.read.format("arrow").load(dir).count()
    }
    assert(messages(e).exists(m => m.contains("inconsistent schema") &&
      m.contains(".arrow")), s"got: ${messages(e)}")
    // known-consistent directories can skip the O(files) footer check
    val relaxed = spark.read.format("arrow")
      .option("verifySchema", "false").load(dir)
    assert(relaxed.schema.nonEmpty)
  }

  test("a second append write is read as the union of both writes") {
    val dir = java.nio.file.Files.createTempDirectory("arrow_app").toString
    val src = Tables.load(spark, TestSession.Sf, "nation")
    src.write.format("arrow").mode("append").save(dir)
    src.write.format("arrow").mode("append").save(dir)
    val back = spark.read.format("arrow").load(dir)
    assert(back.count() == 2 * src.count())
    assert(back.select(countDistinct(col("n_nationkey"))).head.getLong(0)
      == src.count())
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.arrow.ArrowDataSource

/** TOP-N pushdown (`SupportsPushDownTopN`): `ORDER BY c LIMIT n` plans
  * only the record batches that can hold a top-N row — proved with the
  * process-wide batch-load counter, exactness proved against the full
  * sort, soundness proved under nulls, murky stats, and random data
  * (the selection never relies on the layout being sorted). */
class TopNPushdownSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def batchesFor(body: => Unit): Long = {
    val before = ArrowDataSource.recordBatchesLoaded.get()
    body
    ArrowDataSource.recordBatchesLoaded.get() - before
  }

  test("decimal top-n compares stats numerically, never as bytes — " +
      "digit-count boundaries and negatives stay exact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("topn_dec").toString
    // values cross the 3→4-digit boundary ("1000.00" < "900.00"
    // bytewise) and include negatives: the two classes a byte compare
    // of toPlainString stats mis-orders
    (1L to 4000L).map(i => (i, BigDecimal(i) - BigDecimal("2000.50")))
      .toDF("k", "amt")
      .select(col("k"), col("amt").cast("decimal(12,2)").as("amt"))
      .repartition(1).sortWithinPartitions("amt")
      .write.format("arrow").option("batchRows", 250)
      .mode("overwrite").save(dir)
    def rd = spark.read.format("arrow").load(dir)
    val full = batchesFor(rd.write.format("noop").mode("overwrite").save())
    assert(full >= 16)
    val asc = rd.orderBy(col("amt")).limit(5)
    var got: Array[java.math.BigDecimal] = null
    val ascBatches = batchesFor {
      got = asc.collect().map(_.getDecimal(1))
    }
    assert(got.map(BigDecimal(_)).toSeq ==
      (1L to 5L).map(i => BigDecimal(i) - BigDecimal("2000.50")),
      s"decimal asc top-n returned ${got.toSeq}")
    assert(ascBatches < full / 4,
      s"decimal top-n pruned nothing ($ascBatches of $full)")
    val desc = rd.orderBy(col("amt").desc).limit(5)
    var gotD: Array[java.math.BigDecimal] = null
    val descBatches = batchesFor {
      gotD = desc.collect().map(_.getDecimal(1))
    }
    assert(gotD.map(BigDecimal(_)).toSeq ==
      (3996L to 4000L).reverse.map(i => BigDecimal(i) - BigDecimal("2000.50")),
      s"decimal desc top-n returned ${gotD.toSeq}")
    assert(descBatches < full / 4)
  }

  test("top-n over a sorted layout reads a sliver of the batches, " +
      "exactly — asc, desc, and string ordering") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("topn").toString
    (1L to 4000L).map(i => (i, s"s${"%05d".format(i)}", i % 97L))
      .toDF("k", "s", "v")
      .repartition(1).sortWithinPartitions("k")
      .write.format("arrow").option("batchRows", 250)
      .mode("overwrite").save(dir)
    def rd = spark.read.format("arrow").load(dir)
    val full = batchesFor(rd.write.format("noop").mode("overwrite").save())
    assert(full >= 16)

    val asc = rd.orderBy(col("k")).limit(10)
    assert(asc.queryExecution.executedPlan.toString.contains("topN=["),
      s"top-n not pushed:\n${asc.queryExecution.executedPlan}")
    var got: Array[Long] = null
    val ascBatches = batchesFor {
      got = asc.collect().map(_.getLong(0))
    }
    assert(got.toSeq == (1L to 10L).toSeq)
    assert(ascBatches < full / 4,
      s"asc top-n read $ascBatches of $full batches")

    val desc = rd.orderBy(col("k").desc).limit(7)
    var gotD: Array[Long] = null
    val descBatches = batchesFor {
      gotD = desc.collect().map(_.getLong(0))
    }
    assert(gotD.toSeq == (3994L to 4000L).reverse.toSeq)
    assert(descBatches < full / 4,
      s"desc top-n read $descBatches of $full batches")

    // string ordering rides the string zone maps (k-aligned padding
    // makes s-order equal k-order)
    val str = rd.orderBy(col("s")).limit(5)
    var gotS: Array[String] = null
    val strBatches = batchesFor { gotS = str.collect().map(_.getString(1)) }
    assert(gotS.toSeq == (1L to 5L).map(i => s"s${"%05d".format(i)}"))
    assert(strBatches < full / 4,
      s"string top-n read $strBatches of $full batches")
  }

  test("soundness: nulls, unsorted layouts, and random Ns stay exact") {
    import spark.implicits._
    val rnd = new scala.util.Random(8128L)
    val dir = java.nio.file.Files.createTempDirectory("topn_rand").toString
    // UNSORTED layout with nulls: pruning may be weak, never wrong
    val data = (1 to 3000).map { i =>
      (i.toLong, if (i % 17 == 0) None else Some(rnd.nextInt(100000).toLong))
    }
    data.toDF("id", "x")
      .repartition(3)
      .write.format("arrow").option("batchRows", 200)
      .mode("overwrite").save(dir)
    val truthAsc = data.flatMap(_._2).sorted
    def rd = spark.read.format("arrow").load(dir)
    for (n <- Seq(1, 25, 400)) {
      // nulls sort FIRST on asc: the top-n are nulls then smallest
      val gotAsc = rd.orderBy(col("x")).limit(n)
        .collect().map(r => if (r.isNullAt(1)) null else r.getLong(1))
      val nNulls = data.count(_._2.isEmpty)
      val expectAsc: Seq[Any] =
        Seq.fill(math.min(n, nNulls))(null) ++
          truthAsc.take(math.max(0, n - nNulls)).map(x => x: Any)
      assert(gotAsc.toSeq == expectAsc, s"asc n=$n")
      // desc: nulls LAST by default
      val gotDesc = rd.orderBy(col("x").desc).limit(n)
        .collect().map(r => if (r.isNullAt(1)) null else r.getLong(1))
      val expectDesc: Seq[Any] =
        truthAsc.takeRight(n).reverse.map(x => x: Any) ++
          Seq.fill(math.max(0, n - truthAsc.length))(null)
      assert(gotDesc.toSeq == expectDesc, s"desc n=$n")
    }
  }
}

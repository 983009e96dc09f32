package graft.tools

import java.nio.file.Files

import graft.{Engine, Tables}

/** Dev smoke for the Arrow IPC DSv2: parquet → arrow (per codec) →
  * read back → bag-equality with the original (the storage-engine
  * round-trip contract, SURVEY.md §5). */
object ArrowSmoke {
  def main(args: Array[String]): Unit = {
    val spark = Engine.local(4)
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val base = Files.createTempDirectory("arrow_smoke").toString
    val codecs = Seq(None, Some("lz4"), Some("zstd"))
    var failed = false
    for ((table, i) <- Tables.all.zipWithIndex) {
      val codec = codecs(i % codecs.size)
      val src = Tables.load(spark, sfDir, table)
      val dir = s"$base/$table"
      val w = src.write.format("arrow").mode("overwrite")
      codec.fold(w)(c => w.option("codec", c)).save(dir)
      val back = spark.read.format("arrow").load(dir)
      val (srcRows, backRows) = (src.count(), back.count())
      val diff = src.exceptAll(back).count() + back.exceptAll(src).count()
      val ok = srcRows == backRows && diff == 0 &&
        back.schema == src.schema
      if (!ok) failed = true
      println(s"ARROW_RT $table codec=${codec.getOrElse("none")} " +
        s"rows=$srcRows/$backRows diff=$diff schemaOk=${back.schema == src.schema} ${if (ok) "OK" else "FAIL"}")
    }
    // filter + pruning pushdown sanity on the arrow scan
    val liDir = s"$base/lineitem"
    val scan = spark.read.format("arrow").load(liDir)
      .filter(org.apache.spark.sql.functions.col("l_orderkey") <= 100)
      .select("l_orderkey", "l_quantity")
    scan.explain("formatted")
    println(s"ARROW_FILTERED_ROWS=${scan.count()}")
    println(if (failed) "ARROW_SMOKE=FAIL" else "ARROW_SMOKE=OK")
    spark.stop()
    if (failed) sys.exit(1)
  }
}

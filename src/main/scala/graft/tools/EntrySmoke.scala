package graft.tools


/** Dev smoke for the driver's `SparkEntry.entry` contract (rows > 0). */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.local(4)
    val df = graft.SparkEntry.entry(spark)
    df.show(20, truncate = false)
    println(s"ENTRY_ROWS=${df.count()}")
    spark.stop()
  }
}

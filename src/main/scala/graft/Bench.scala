package graft


/** Benchmark main (driver contract): runs every declared query on
  * SPARK_GRAFT_SF_DIR, prints one JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Queries execute into the noop sink — unlike count(), noop cannot be
  * optimized into a metadata-only or aggregate-pruned plan, so the
  * timing covers the full pipeline including result materialization.
  * Each query runs warm-up → two timed runs (min reported), grouped by
  * query family with fixture-memo + cache eviction at family
  * boundaries, so one-off JVM costs are not attributed to the queries
  * AND accumulated fixture caches cannot pressure later families'
  * timings (BENCH_MEM.json records the boundary storage/GC readings).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Engine.sessionBuilder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    // Per-query warm-up + min-of-2 timed runs, grouped by query FAMILY
    // (the name prefix before the first '_'), with every session-scoped
    // fixture memo AND the session cache evicted at family boundaries.
    //
    // Why not the old global warm pass + two global timed passes: by
    // the timed passes ~17 fixture memos (shingle index, band tables,
    // IVF/PQ fits, graph edge sets, LM tables) plus per-query implicit
    // plan-keyed persists all coexisted in the one local[32] heap, and
    // the collective storage/GC pressure inflated the official total
    // ~1.7× over standalone per-query minima (round-15 verdict #1) —
    // the artifact measured cache pressure, not plans. Family grouping
    // keeps at most ~one family's fixtures resident; the warm-up runs
    // IMMEDIATELY before a query's timed runs, so each query still
    // times with its fixtures hot (same steady-state semantics: one-off
    // JVM work — codegen compilation, JIT, footer caches, fixture
    // builds — amortizes to zero on a long-lived cluster).
    //
    // Min-of-2 is kept: single-run numbers on a shared container swing
    // 2–4× under co-tenant CPU bursts. A query that throws during a
    // timed run contributes ~0 s, which would make a crash look like a
    // speedup — so failures are counted and surfaced in the JSON line.
    val names = SparkEntry.queries.keys.toSeq.sorted
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    def time(name: String): Double = {
      val t0 = System.nanoTime()
      try run(name) catch { case _: Throwable => failed += name }
      (System.nanoTime() - t0) / 1e9
    }
    def familyOf(n: String): String = n.takeWhile(_ != '_')
    // storage/GC instrumentation at family boundaries → BENCH_MEM.json:
    // the evidence trail that residency stays bounded (and, if a future
    // fixture regresses that, WHERE the pressure came from)
    val gcBeans = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans
    def gcMs: Long = {
      var s = 0L; gcBeans.forEach(b => s += b.getCollectionTime); s
    }
    def storageMB: Long =
      spark.sparkContext.getRDDStorageInfo.map(_.memSize).sum >> 20
    def heapMB: Long = {
      val r = Runtime.getRuntime; (r.totalMemory - r.freeMemory) >> 20
    }
    val memLog = scala.collection.mutable.ArrayBuffer.empty[String]
    var fam: String = null
    val results = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    for (n <- names) {
      val f = familyOf(n)
      if (f != fam) {
        if (fam != null) FixtureCaches.evictAll(spark)
        memLog += s"""{"family":"$f","storage_mb_at_entry":$storageMB,""" +
          s""""heap_mb":$heapMB,"gc_ms":$gcMs}"""
        fam = f
      }
      try run(n) catch { case _: Throwable => () } // warm-up, untimed
      results += (n -> math.min(time(n), time(n)))
    }
    FixtureCaches.evictAll(spark)
    memLog += s"""{"family":"_end","storage_mb_at_entry":$storageMB,""" +
      s""""heap_mb":$heapMB,"gc_ms":$gcMs}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_MEM.json"),
      memLog.mkString("[", ",\n ", "]\n"))
    val sfName = new java.io.File(sfDir).getName
    val out = Bench.formatLine(results.toSeq, sfName, failed.size)

    // Full per-query sidecar: the stdout line is tail-compacted for
    // the harness (fast queries collapse into "_others" past ~50
    // entries), which blinds round-over-round regression tracking to
    // most of the surface. The COMPLETE map always lands in a file
    // the driver captures alongside the logs.
    val full = results.map { case (k, v) =>
      "\"" + k + "\":" + BigDecimal(v)
        .setScale(3, BigDecimal.RoundingMode.HALF_UP)
    }.mkString("{", ",", "}")
    val fullLine =
      s"""{"metric":"total","value":${BigDecimal(results.map(_._2).sum)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)},"unit":"sec","failures":${failed.size},"queries":$full,"sf":"$sfName"}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_FULL.json"), fullLine + "\n")

    // stop BEFORE printing: nothing (stray executor/shutdown WARNs
    // included) may land between the JSON line and the end of output.
    spark.stop()
    println(out)
  }

  // The harness reads the JSON from a bounded (2000-char) tail of the
  // process output and does strict per-line json.loads, so the line
  // must stay compact AND be valid JSON: rounded values, the sf
  // basename, and — if the declared-query set outgrows the budget —
  // per-query precision drops to 1 decimal, then the fastest entries
  // collapse into one "_others" bucket. `total` always covers every
  // query at full precision of the rounding. Factored out so
  // BenchLineSpec can pin both properties at the CURRENT query count
  // (three rounds shipped with an unparseable line before this
  // contract had a test).
  def formatLine(results: Seq[(String, Double)], sfName: String,
      failures: Int = 0): String = {
    def fmt(v: Double, dp: Int): String = BigDecimal(v)
      .setScale(dp, BigDecimal.RoundingMode.HALF_UP).toString
    val total = results.map(_._2).sum
    def line(dp: Int, keep: Int): String = {
      val shown =
        if (keep >= results.size) results
        else {
          val top = results.sortBy(-_._2).take(keep).map(_._1).toSet
          results.filter(r => top(r._1)) :+
            ("_others" -> results.filterNot(r => top(r._1)).map(_._2).sum)
        }
      val qs = shown.map { case (k, v) => "\"" + k + "\":" + fmt(v, dp) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmt(total, 2)},"unit":"sec","failures":$failures,"queries":$qs,"sf":"$sfName"}"""
    }
    Seq(line(2, Int.MaxValue), line(1, Int.MaxValue), line(1, 50))
      .find(_.length <= 1800).getOrElse(line(1, 30))
  }
}

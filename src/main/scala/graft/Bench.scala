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
  * timings. When a min looks poisoned by co-tenant contention (the two
  * passes disagree >1.5×, or the min exceeds 5× the last committed
  * steady-state value for the same query), up to 2 extra timed passes
  * re-estimate it under a global budget — steady-state estimation per
  * BASELINE.md's metric definition, robust to contention windows that
  * outlast min-of-2 (round-16 gate breach). BENCH_MEM.json records
  * per-family storage, pre/post-forced-GC heap, cumulative GC, and
  * machine weather (loadavg, iowait/steal shares), so a contended run
  * is provably contended.
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

    // Per-query reference timings from the last committed full run
    // (BENCH_FULL.json at the repo root — the driver runs from a clean
    // checkout, so this is the previous round's honest steady-state
    // number). Used ONLY as a contention tripwire below, never as a
    // reported value.
    val refTimes: Map[String, Double] = try {
      val p = java.nio.file.Paths.get("BENCH_FULL.json")
      if (!java.nio.file.Files.exists(p)) Map.empty
      else {
        val s = java.nio.file.Files.readString(p)
        val i = s.indexOf("\"queries\":")
        if (i < 0) Map.empty
        else """"([A-Za-z0-9_]+)":([0-9][0-9.]*)""".r
          .findAllMatchIn(s.substring(i))
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      }
    } catch { case _: Throwable => Map.empty }

    // Contention-robust timing (round-16 verdict task #1a). The metric
    // is defined as steady-state post-warm-up wall time (BASELINE.md);
    // on a shared container a co-tenant CPU/memory burst can poison
    // BOTH timed passes of a query — min-of-2 cannot dodge a
    // minutes-long contention window (round 16: graph_sssp_bounded
    // read 52.3 s in the official artifact vs 0.49 s plan-true). Two
    // independent tripwires mark a min as untrusted:
    //   (1) unconfirmed: no second run lands within 1.5× of the min
    //       (the two passes disagree >1.5×, i.e. at least one was
    //       disturbed) — only above a 0.3 s floor, where scheduler
    //       jitter alone can no longer explain the spread;
    //   (2) over-reference: the min exceeds 5× the same query's last
    //       committed steady-state value (floored at 0.15 s) — plans
    //       don't regress 5× without a code change, machines do.
    // Either tripwire buys up to 2 extra timed passes (min over all),
    // under a GLOBAL budget (120 extra passes / 300 s) so a uniformly
    // slow environment degrades to the old min-of-2 behavior instead
    // of tripling the run.
    var extraPasses = 0
    var extraSecs = 0.0
    var retriedQueries = 0
    def timedMin(n: String): Double = {
      var ts = List(time(n), time(n))
      def mn = ts.min
      def unconfirmed = ts.count(_ <= mn * 1.5) < 2 && mn > 0.3
      def overRef = refTimes.get(n).exists(r => mn > 5.0 * math.max(r, 0.15))
      var r = 0
      while (r < 2 && extraPasses < 120 && extraSecs < 300.0 &&
             (unconfirmed || overRef)) {
        val t = time(n); ts ::= t; extraSecs += t; extraPasses += 1; r += 1
      }
      if (r > 0) retriedQueries += 1
      mn
    }

    // Instrumentation at family boundaries → BENCH_MEM.json: the
    // evidence trail that (a) residency stays bounded and (b) a slow
    // run was provably contended rather than arguably contended
    // (round-16 verdict task #1b). heap is read BEFORE and AFTER a
    // forced System.gc(): the pre value alone cannot distinguish
    // retention from uncollected garbage (r16 verdict #4); the post
    // value can — multi-GB post-GC heap with storage 0 means real
    // non-cache retention. The forced GC also drains the
    // ContextCleaner's weak-ref queue (broadcast/shuffle blocks from
    // the previous family), so each family starts from a small heap
    // instead of amplifying co-tenant pressure into 20-30 s mixed
    // collections mid-query.
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
    def loadavg: String = try {
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg"))).trim
        .split(" ").take(3).mkString(",")
    } catch { case _: Throwable => "" }
    // /proc/stat aggregate cpu line: user nice system idle iowait irq
    // softirq steal ... — iowait/steal shares of the delta since the
    // previous boundary are the canonical "weather" signals (steal =
    // hypervisor took our cycles, iowait = disk contention).
    def cpuJiffies: (Long, Long, Long) = try {
      val line = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get("/proc/stat")).get(0)
      val f = line.trim.split("\\s+").drop(1).map(_.toLong)
      (f.sum, if (f.length > 4) f(4) else 0L, if (f.length > 7) f(7) else 0L)
    } catch { case _: Throwable => (0L, 0L, 0L) }
    var (jTot, jIo, jSteal) = cpuJiffies
    def memEntry(f: String): String = {
      val pre = heapMB
      System.gc()
      val post = heapMB
      val (t, io, st) = cpuJiffies
      val dt = math.max(t - jTot, 1L)
      val ioPct = (io - jIo) * 100.0 / dt
      val stPct = (st - jSteal) * 100.0 / dt
      jTot = t; jIo = io; jSteal = st
      f"""{"family":"$f","storage_mb_at_entry":$storageMB,""" +
        f""""heap_mb_pre":$pre,"heap_mb_post_gc":$post,"gc_ms":$gcMs,""" +
        f""""loadavg":"$loadavg","iowait_pct":$ioPct%.1f,""" +
        f""""steal_pct":$stPct%.1f}"""
    }
    val memLog = scala.collection.mutable.ArrayBuffer.empty[String]
    var fam: String = null
    val results = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    for (n <- names) {
      val f = familyOf(n)
      if (f != fam) {
        if (fam != null) FixtureCaches.evictAll(spark)
        memLog += memEntry(f)
        fam = f
      }
      try run(n) catch { case _: Throwable => () } // warm-up, untimed
      results += (n -> timedMin(n))
    }
    FixtureCaches.evictAll(spark)
    memLog += memEntry("_end")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_MEM.json"),
      memLog.mkString("[", ",\n ", "]\n"))
    val sfName = new java.io.File(sfDir).getName
    val out = Bench.formatLine(results.toSeq, sfName, failed.size,
      retriedQueries)

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
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)},"unit":"sec","failures":${failed.size},"retried":$retriedQueries,"queries":$full,"sf":"$sfName"}"""
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
      failures: Int = 0, retried: Int = 0): String = {
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
      s"""{"metric":"total","value":${fmt(total, 2)},"unit":"sec","failures":$failures,"retried":$retried,"queries":$qs,"sf":"$sfName"}"""
    }
    Seq(line(2, Int.MaxValue), line(1, Int.MaxValue), line(1, 50))
      .find(_.length <= 1800).getOrElse(line(1, 30))
  }
}

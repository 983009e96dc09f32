package graft

/** Per-process scratch paths for queries that materialize an
  * intermediate layout (roundtrips, partitioned/compacted/clustered
  * copies). The pid token makes concurrent JVMs collision-free (bench
  * racing verify over the same dataset), the path is stable within one
  * process (warm-up and timed bench passes reuse it), and every path
  * handed out is best-effort deleted at JVM exit so repeated runs
  * don't accumulate orphans in the temp dir. */
object Scratch {
  private val issued =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private lazy val hook: Unit = {
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      issued.forEach(p => rm(new java.io.File(p)))
    }
    ()
  }

  /** Best-effort recursive delete — for fixtures a query REBUILDS per
    * invocation (mutation state must not leak across runs). */
  def reset(paths: String*): Unit = paths.foreach { p =>
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(); ()
    }
    rm(new java.io.File(p))
  }

  /** `tmpdir/graft_<kind>_<pid>_<token>`, registered for exit reaping. */
  def dir(kind: String, token: String): String = {
    hook
    val p = s"${System.getProperty("java.io.tmpdir")}/graft_${kind}_" +
      s"${ProcessHandle.current().pid()}_" +
      token.replaceAll("[^A-Za-z0-9.]", "_")
    issued.add(p)
    p
  }
}

/** Once-per-process memo for READ-ONLY query fixtures (a layout
  * written solely so the declared query can read through it — the
  * Arrow/ORC/CSV round-trip sources, bucketed/sorted/partitioned join
  * layouts). The bench contract runs one untimed warm-up pass and two
  * timed passes per query; without the memo every timed pass re-pays
  * the fixture WRITE, so the benchmark's fixed per-query overhead
  * grows with the declared surface while measuring nothing about the
  * operator under test. With it, warm-up materializes the layout once
  * and the timed passes measure the read path — which is the
  * steady-state cost on a real cluster, where a bucketed/sorted layout
  * is written once and joined thousands of times.
  *
  * NEVER use for fixtures a query MUTATES (DML, compaction, restore,
  * CDC): those recompute state per run by design. Scratch paths embed
  * the pid, so the memo key is process-local like the paths it guards;
  * a failed build retracts the key so the next run retries. */
object Fixtures {
  private val built = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.CountDownLatch]()

  /** Run `build` exactly once per key per process, with a
    * happens-before for every caller: a concurrent second caller
    * BLOCKS until the winning build completes rather than returning
    * into a half-built fixture (the cdc consumers share one
    * multi-epoch source — a parallel dispatcher must not drain a
    * source whose DML epochs are still landing). A failed build
    * releases the key so the next caller retries. */
  def once(key: String)(build: => Unit): Unit = {
    while (true) {
      val latch = new java.util.concurrent.CountDownLatch(1)
      val prev = built.putIfAbsent(key, latch)
      if (prev == null) {
        var ok = false
        try { build; ok = true }
        finally {
          if (!ok) built.remove(key, latch)
          latch.countDown()
        }
        return
      }
      prev.await()
      // still mapped to the latch we waited on → that build succeeded
      if (built.get(key) eq prev) return
      // else it failed and released the key — loop and contend again
    }
  }
}

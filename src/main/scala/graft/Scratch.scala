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

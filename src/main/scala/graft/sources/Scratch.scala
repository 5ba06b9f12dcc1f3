package graft.sources

/** JVM-exit cleanup registry for pid-suffixed scratch/fixture dirs.
  *
  * Gate and bench queries that persist an index or a rewritten layout
  * key their paths by process id so two JVMs running the same scale
  * factor concurrently never race on an overwrite (one would delete
  * bucket files the other is mid-read on). The pid suffix also means
  * nothing else ever reads the path again — without exit cleanup every
  * gate/bench process permanently leaks a full copy under /tmp.
  * Deletion at shutdown is safe for exactly the reason the suffix
  * exists: the registering process is the only reader.
  */
object Scratch {
  private val cleanupPaths = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private lazy val cleanupHook: Unit = Runtime.getRuntime.addShutdownHook(new Thread(() =>
    cleanupPaths.forEach { p =>
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      try rm(new java.io.File(p)) catch { case _: Throwable => () }
    }))

  /** Register `path` for recursive deletion at JVM exit. */
  def cleanupAtExit(path: String): Unit = { cleanupHook; cleanupPaths.add(path); () }
}

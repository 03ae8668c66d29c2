package graft

/** Process-scoped scratch-directory registry (VERDICT r18 #4).
  *
  * Specs, gates and tools create hundreds of temp index dirs per
  * session, and ~2,000 leftovers once produced a fake 2–3× regression on
  * the FS-metadata-heavy lifecycle gates (BENCH_NOTES r18) — the fix was
  * manual cleanup, so the next fake regression was one long session
  * away. Every scratch dir now registers here, and a JVM shutdown hook
  * deletes the registered set — UNLESS something marked the process
  * failed (`keepForForensics`), in which case everything stays on disk
  * for post-mortem:
  *
  *   - `SparkSpec.withFixture` marks on any test failure, so a red suite
  *     keeps its fixtures
  *   - a default uncaught-exception handler (chained, not clobbered)
  *     marks on a crash escaping any thread, so a dying tool keeps its
  *     work dirs
  *
  * The hook bounds /tmp growth per PROCESS on the success path; dirs
  * from killed processes (kill -9 skips shutdown hooks) still linger,
  * which is why `graft.Bench` additionally records `tmp_dirs_at_start`
  * as a contamination flag in its artifact.
  */
object TempDirs {
  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.nio.file.Path]()
  @volatile private var keep = false

  /** Keep every registered dir at exit — a failure wants forensics. */
  def keepForForensics(): Unit = { keep = true }

  /** Create-and-register a scratch dir under java.io.tmpdir. Drop-in
    * replacement for `java.nio.file.Files.createTempDirectory(prefix)`. */
  def scratch(prefix: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    registered.add(p)
    p
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(p)) {
      val walk = java.nio.file.Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder()).iterator().asScala
        .foreach(f => try java.nio.file.Files.deleteIfExists(f)
          catch { case _: java.io.IOException => () })
      finally walk.close()
    }
  }

  /** Delete everything registered (no-op after `keepForForensics`).
    * Runs from the shutdown hook; callable earlier by a tool that knows
    * its dirs are dead (nothing may still read them). */
  def cleanup(): Unit = if (!keep) {
    import scala.jdk.CollectionConverters._
    registered.asScala.toSeq.foreach { p =>
      try deleteRecursively(p) catch { case _: Throwable => () }
      registered.remove(p)
    }
  }

  locally {
    val prev = Thread.getDefaultUncaughtExceptionHandler
    Thread.setDefaultUncaughtExceptionHandler((t, e) => {
      // only a NON-daemon thread's death marks the process failed: a
      // benign daemon-thread throwable (executor heartbeat races at
      // shutdown, etc.) would otherwise stickily disable all cleanup
      // for the whole process (ADVICE r19). The mark is logged so a
      // silently-kept /tmp is attributable to its cause.
      if (!t.isDaemon) {
        System.err.println(
          s"[TempDirs] keeping scratch dirs for forensics: uncaught " +
            s"${e.getClass.getName} in thread ${t.getName}")
        keepForForensics()
      }
      if (prev != null) prev.uncaughtException(t, e)
      else {
        System.err.println(s"Uncaught exception in ${t.getName}:")
        e.printStackTrace()
      }
    })
    java.lang.Runtime.getRuntime.addShutdownHook(
      new Thread(() => cleanup(), "graft-tempdirs-cleanup"))
  }
}

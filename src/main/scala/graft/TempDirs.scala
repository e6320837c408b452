package graft

import java.nio.file.{Files, Path}

/** Process-lifetime scratch directories (IVF index parquet, CSV
  * round-trip staging). Every directory handed out here is deleted by
  * one JVM shutdown hook, so repeated Bench/Verify runs don't
  * accumulate `graft_*` litter under the system temp root.
  *
  * On a real cluster these artifacts would live under a managed cache
  * root (`spark.local.dir` or a warehouse path) with explicit lifecycle
  * — the shutdown hook is the local-mode equivalent.
  */
object TempDirs {

  private val created = new java.util.concurrent.ConcurrentLinkedQueue[Path]

  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      created.forEach(deleteRecursively(_))
    }, "graft-tempdir-cleanup"))
  }

  /** Create a temp directory that is removed on JVM exit. */
  def create(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    created.add(p)
    p
  }

  private def deleteRecursively(p: Path): Unit =
    try {
      if (Files.exists(p)) {
        Files.walk(p).sorted(java.util.Comparator.reverseOrder())
          .forEach(f => { try Files.delete(f) catch { case _: Exception => () } })
      }
    } catch { case _: Exception => () }
}

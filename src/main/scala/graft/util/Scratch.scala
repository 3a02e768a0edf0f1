package graft.util

import java.nio.file.{Files, Path}
import java.util.Comparator

/** JVM-wide scratch root for query-scoped icelite warehouses and
  * persisted index tables. Every per-invocation temp warehouse the
  * oracle-gated table queries create lands under ONE root that a
  * shutdown hook deletes recursively — without it, each bench/verify
  * run leaked tens of MB of orders copies per invocation
  * (`Files.createTempDirectory` dirs are never reclaimed by the OS
  * between runs on a long-lived box).
  */
object Scratch {

  private lazy val root: Path = {
    val p = Files.createTempDirectory("graft-scratch-")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(p)))
    p
  }

  /** A fresh scratch directory under the shared cleaned-on-exit root. */
  def dir(prefix: String): String =
    Files.createTempDirectory(root, prefix).toString

  private def deleteRecursively(p: Path): Unit =
    try {
      if (Files.exists(p))
        Files.walk(p).sorted(Comparator.reverseOrder[Path]())
          .forEach(f => try Files.deleteIfExists(f) catch { case _: Exception => () })
    } catch { case _: Exception => () } // shutdown cleanup is best-effort
}

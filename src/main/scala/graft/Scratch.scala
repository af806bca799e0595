package graft

import java.io.File
import java.nio.file.{Files, Path}

/** Per-JVM scratch space for sink round-trip queries (k01/k02/k03/st03).
  *
  * One root directory, removed recursively on JVM exit — repeated
  * bench/verify runs no longer accumulate orphaned table copies under
  * /tmp (each invocation previously leaked a full temp dir).
  */
object Scratch {
  private lazy val root: Path = {
    val p = Files.createTempDirectory("graft_scratch_")
    Runtime.getRuntime.addShutdownHook(new Thread(() => delete(p.toFile)))
    p
  }

  private def delete(f: File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(delete)
    f.delete(): Unit
  }

  /** Fresh subdirectory under the per-JVM root; auto-removed at exit. */
  def dir(prefix: String): String =
    Files.createTempDirectory(root, prefix).toString
}

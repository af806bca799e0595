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

  private val pinned =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Like [[dir]], but survives [[reap]] — for staging a path cache
    * hands out across queries (the streaming chunk staging). */
  def pinnedDir(prefix: String): String = {
    val d = dir(prefix)
    pinned.add(d): Unit
    d
  }

  /** Delete every UNPINNED scratch subdir. A full bench suite otherwise
    * accumulates one fact-scale sink per streaming query per rep until
    * JVM exit — at the sf100 rehearsal that exhausted the disk mid-suite
    * (round 9's 38-failure ladder). Bench calls this after each query's
    * output is consumed; query entries are self-contained (the driver
    * runs each independently), so nothing reads another query's scratch. */
  def reap(): Unit = {
    val children = root.toFile.listFiles()
    if (children != null)
      children.filterNot(f => pinned.contains(f.getPath)).foreach(delete)
  }
}

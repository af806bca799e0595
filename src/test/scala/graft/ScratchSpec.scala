package graft

import java.io.File
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Pins the scratch pin/reap contract Bench and Verify rely on: a full
  * suite run reaps each query's consumed sink dirs between queries while
  * the shared streaming chunk staging (pinnedDir) survives — the
  * invariant that keeps suite disk flat at rehearsal SFs (round 9's
  * sf100 ladder died mid-suite on accumulated fact-scale sinks). */
class ScratchSpec extends AnyFunSuite {

  test("reap deletes plain dirs, keeps pinned dirs, and dir() still works") {
    val plain = Scratch.dir("spec_plain_")
    val pinned = Scratch.pinnedDir("spec_pinned_")
    // contents are deleted recursively, not just the top dir
    Files.writeString(new File(plain, "payload").toPath, "x"): Unit
    Files.writeString(new File(pinned, "payload").toPath, "y"): Unit

    Scratch.reap()

    assert(!new File(plain).exists(), "unpinned dir must be reaped")
    assert(new File(pinned, "payload").exists(),
      "pinned staging must survive reap — the chunked stream staging is " +
        "handed out by a cross-query cache")

    // scratch stays usable after a reap (the next query allocates again)
    val again = Scratch.dir("spec_again_")
    assert(new File(again).isDirectory)
    Scratch.reap()
    assert(!new File(again).exists())
    assert(new File(pinned).exists(), "pins are permanent for the JVM")
  }
}

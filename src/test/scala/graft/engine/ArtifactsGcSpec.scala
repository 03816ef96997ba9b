package graft.engine

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite

/** [[Artifacts.gcDeadSessions]]'s sweep rule: a `graft_…` entry whose
  * embedded pid (first all-digits segment) no longer names a live process
  * is deleted; live-pid entries, non-graft entries, and entries with no
  * pid segment are kept. The session-scoped artifact names make
  * publish-if-absent safe but mean nothing ever reuses a dead session's
  * warehouse tables/tmp roots — without the sweep, disk grows by one
  * artifact set per session forever (322 MB observed after 14 rounds). */
class ArtifactsGcSpec extends AnyFunSuite {

  private def mkDir(parent: Path, name: String): Path = {
    val d = Files.createDirectory(parent.resolve(name))
    Files.writeString(d.resolve("data.bin"), "x")
    d
  }

  test("gcIn deletes dead-pid graft dirs, keeps live/self/non-graft/unparseable") {
    val parent = Files.createTempDirectory("graft-gc-spec")
    // a pid that existed and is now certainly dead
    val p = new ProcessBuilder("true").start()
    p.waitFor()
    val deadPid = p.pid()
    val self = ProcessHandle.current().pid()
    val dead1 = mkDir(parent, s"graft_bench13_${deadPid}_1786755665263_ab12cd34")
    val dead2 = mkDir(parent, s"graft_x65_trim_$deadPid")
    val live = mkDir(parent, s"graft_vocab16f_${self}_1786755665263_ab12cd34")
    val notGraft = mkDir(parent, s"spark_${deadPid}_whatever")
    val noPid = mkDir(parent, "graft_nopid_marker")
    Artifacts.gcIn(parent)
    assert(!Files.exists(dead1) && !Files.exists(dead2),
      "dead-session artifacts must be swept")
    assert(Files.exists(live), "the current session's artifacts must survive")
    assert(Files.exists(notGraft), "non-graft entries are out of scope")
    assert(Files.exists(noPid), "entries with no pid segment are kept")
  }
}

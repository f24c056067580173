package nelspark

import org.scalatest.funsuite.AnyFunSuite

/** Shuffle-dir hygiene (round-2 post-mortem): dead-JVM tmpfs dirs are
  * swept at session startup; live ones are kept; the caller gets either
  * a fresh per-pid tmpfs dir or the /tmp fallback. No SparkSession
  * needed — localDir() is pure filesystem logic. */
class MainSpec extends AnyFunSuite {

  test("localDir sweeps dead-pid and legacy tmpfs dirs, keeps live ones") {
    assume(new java.io.File("/dev/shm").isDirectory)
    val base = new java.io.File("/dev/shm/nelspark-local")
    base.mkdirs()
    // a pid that cannot exist (kernel pid_max is far below this)
    val dead = new java.io.File(base, "999999999")
    dead.mkdirs()
    assert(new java.io.File(dead, "junk").createNewFile())
    // pre-round-3 layout: non-pid-named entry — always stale
    val legacy = new java.io.File(base, "legacy-shuffle")
    legacy.mkdirs()
    // a live FOREIGN sibling (a concurrently running bench JVM's shuffle
    // dir) must survive the sweep. Round-3 advice: our own pid's dir is
    // created by localDir() itself, so it cannot detect a sweep
    // regression — pre-create a dir for a genuinely live foreign pid
    // (pid 1, alive in any container) with a sentinel file inside.
    val foreign = new java.io.File(base, "1")
    foreign.mkdirs()
    val sentinel = new java.io.File(foreign, "sentinel")
    sentinel.createNewFile()
    val livePid = ProcessHandle.current().pid().toString
    val live = new java.io.File(base, livePid)

    val got = nelspark.Main.localDir()

    assert(!dead.exists(), "dead-pid dir not swept")
    assert(!legacy.exists(), "legacy non-pid dir not swept")
    assert(foreign.isDirectory && sentinel.exists(),
      "live foreign-pid dir (or its contents) was swept")
    // either tmpfs was >50% used (fallback) or we got our per-pid dir
    assert(got == "/tmp" || (live.isDirectory && got == live.getAbsolutePath),
      s"unexpected localDir: $got")
    // leave no leftovers for other suites
    sentinel.delete(); foreign.delete()
  }
}

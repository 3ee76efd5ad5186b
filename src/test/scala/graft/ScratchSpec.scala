package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the scratch-root policy's resolution matrix: explicit override >
  * free-space-checked /dev/shm > java.io.tmpdir. The free-space check is
  * what keeps a size-capped container tmpfs from failing queries with
  * ENOSPC mid-write.
  */
class ScratchSpec extends AnyFunSuite {

  private val tmp = sys.props("java.io.tmpdir")

  test("explicit GRAFT_SCRATCH_DIR override wins over everything") {
    assert(Scratch.choose(Some("/custom/scratch"), _ => true) == "/custom/scratch")
    assert(Scratch.choose(Some("/custom/scratch"), _ => false) == "/custom/scratch")
  }

  test("blank override is ignored, not used as a path") {
    assert(Scratch.choose(Some("   "), _ => false) == tmp)
  }

  test("usable /dev/shm is preferred when no override is set") {
    assert(Scratch.choose(None, _ => true) == "/dev/shm")
  }

  test("starved or missing /dev/shm falls back to java.io.tmpdir") {
    assert(Scratch.choose(None, _ => false) == tmp)
  }
}

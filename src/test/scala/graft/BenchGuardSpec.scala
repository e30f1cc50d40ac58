package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench's pairing-validity gate (r14): the file-mode ratio must
  * refuse to exist when the two sides' host windows disagree — pure
  * predicate, pure tests. */
class BenchGuardSpec extends AnyFunSuite {

  test("symmetric pairings: close absolute loads or close ratios pass") {
    assert(Bench.pairSymmetric(1.0, 1.2))   // both quiet
    assert(Bench.pairSymmetric(4.0, 5.5))   // both busy, delta in band
    assert(Bench.pairSymmetric(8.0, 10.0))  // high but within 1.5x
    assert(Bench.pairSymmetric(0.0, 0.0))   // idle box
  }

  test("asymmetric pairings: the r12 loaded-vs-quiet class fails") {
    assert(!Bench.pairSymmetric(1.0, 7.0))  // the r12 artifact's shape
    assert(!Bench.pairSymmetric(7.0, 1.0))  // either side may be the loaded one
    assert(!Bench.pairSymmetric(0.5, 6.0))
  }

  test("unknown duck-side load cannot attest symmetry") {
    assert(!Bench.pairSymmetric(-1.0, 1.0))
    assert(!Bench.pairSymmetric(1.0, -1.0))
  }
}

package graft

import org.scalacheck.Gen

/** Minimal property-check helper (scalatestplus-scalacheck isn't in the
  * offline cache; raw scalacheck Gen + a sampling loop is enough). */
trait PropHelper {
  val propRuns = 300

  def forAllG[A](g: Gen[A])(f: A => Unit): Unit = {
    val seed0 = org.scalacheck.rng.Seed(42L)
    var seed = seed0
    var n = 0
    while (n < propRuns) {
      g.apply(Gen.Parameters.default, seed).foreach { a => f(a); n += 1 }
      seed = seed.next
      n += 1 // bound iterations even if the gen keeps failing filters
    }
  }

  def forAllG[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAllG(ga.flatMap(a => gb.map(b => (a, b)))) { case (a, b) => f(a, b) }

  def forAllG[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(f: (A, B, C) => Unit): Unit =
    forAllG(ga.flatMap(a => gb.flatMap(b => gc.map(c => (a, b, c))))) {
      case (a, b, c) => f(a, b, c)
    }
}

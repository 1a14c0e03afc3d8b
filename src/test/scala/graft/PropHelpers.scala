package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Tiny deterministic property-runner over scalacheck Gens (scalatestplus is
  * not in the offline cache). Fixed seed → reproducible, mirroring the
  * reference's seed-reproducible randomized tests.
  */
trait PropHelpers {
  def forAll[A](gen: Gen[A], n: Int = 100)(f: A => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = Seed(42L)
    var i = 0
    var tried = 0
    while (i < n && tried < n * 20) {
      gen.apply(params, seed) match {
        case Some(a) =>
          try f(a)
          catch {
            case e: Throwable =>
              throw new AssertionError(s"property failed for input: $a", e)
          }
          i += 1
        case None =>
      }
      seed = seed.next
      tried += 1
    }
    require(i > n / 2, s"generator too sparse: only $i/$n samples")
  }

  def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))
}

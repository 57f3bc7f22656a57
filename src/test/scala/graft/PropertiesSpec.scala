package graft

import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Kernels
import graft.operators.IntervalIndex
import org.apache.spark.unsafe.types.UTF8String

/** Property-based invariants of the driver-side kernels and the interval
  * index (pure JVM — no Spark jobs, so thousands of cases are cheap). */
class PropertiesSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val ipGen: Gen[Long] = Gen.choose(0L, 0xFFFFFFFFL)

  test("interval index: lookup equals naive scan for random prioritized rules") {
    val ruleGen = for {
      lo <- Gen.choose(0L, 1000L)
      len <- Gen.choose(0L, 200L)
      prio <- Gen.choose(0L, 5L)
    } yield (lo, lo + len, prio)
    val p = forAll(Gen.listOfN(25, ruleGen), Gen.listOfN(50, Gen.choose(-50L, 1400L)),
        Gen.oneOf(true, false)) { (rs, points, lastWins) =>
      val rules = rs.zipWithIndex.map { case ((lo, hi, pr), i) => (lo, hi, pr, i) }
      val idx = IntervalIndex.build(rules, lastWins)
      points.forall { pt =>
        val hits = rules.filter(r => r._1 <= pt && pt <= r._2)
        val expect =
          if (hits.isEmpty) -1
          else if (lastWins) hits.maxBy(r => (r._3, r._4))._4
          else hits.minBy(r => (r._3, r._4))._4
        idx.lookup(pt) == expect
      }
    }
    check(p)
  }

  test("hash60: non-negative, < 2^60, stable, avalanche on suffix change") {
    check(forAll(Gen.alphaNumStr) { s =>
      val h = Kernels.hash60(UTF8String.fromString(s))
      val h2 = Kernels.hash60(UTF8String.fromString(s))
      h >= 0 && h < (1L << 60) && h == h2 &&
        Kernels.hash60(UTF8String.fromString(s + "#")) != h
    })
  }

  test("qround: idempotent and within half-ulp of the grid") {
    val dGen = Gen.choose(-1e6, 1e6)
    check(forAll(dGen, Gen.choose(0, 6)) { (x, d) =>
      val r = Kernels.qround(x, d)
      Kernels.qround(r, d) == r && math.abs(r - x) <= 0.5 / math.pow(10, d) + 1e-9
    })
  }

  test("cosineQ6Arrays: symmetric, bounded, self-cosine 1 for nonzero") {
    val vGen = Gen.listOfN(16, Gen.choose(-1000L, 1000L)).map(_.toArray)
    check(forAll(vGen, vGen) { (a, b) =>
      val ab = Kernels.cosineQ6Arrays(a, b)
      val ba = Kernels.cosineQ6Arrays(b, a)
      val selfOk = {
        val aa = Kernels.cosineQ6Arrays(a, a)
        if (a.exists(_ != 0L)) aa == 1.0 else aa == 0.0
      }
      ab == ba && ab >= -1.0 - 1e-6 && ab <= 1.0 + 1e-6 && selfOk
    })
  }
}

package graft

import graft.sources.SasXport
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks for the pure binary-codec kernels of the
  * interchange sources (no Spark session needed).
  */
class CodecPropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  test("IBM hex-float: exact involution over the full generator sweep") {
    // mantissa bits and base-2 exponent drawn independently so every
    // base-16 alignment class (shift 0..3) is hit, including powers
    // of two, denormal-adjacent magnitudes and negative values
    val g: Gen[Double] = for {
      mant <- Gen.choose(0L, (1L << 52) - 1)
      exp2 <- Gen.choose(-250, 250) // IBM range is ~16^±63 = 2^±252
      neg <- Gen.oneOf(true, false)
    } yield {
      val bits = ((exp2 + 1023).toLong << 52) | mant
      val v = java.lang.Double.longBitsToDouble(bits)
      if (neg) -v else v
    }
    samples(g, 2000, 77L).foreach { v =>
      val ibm = SasXport.ieeeToIbm(v)
      val back = SasXport.ibmToIeee(ibm)
      assert(back == v, s"$v -> $ibm -> $back")
      // fraction must be normalized: top hex digit nonzero (so the
      // encoding is canonical and comparable), except for zero
      val frac = ibm & 0x00ffffffffffffffL
      assert((frac >>> 52) != 0, s"unnormalized fraction for $v")
    }
  }

  test("IBM hex-float: ordering is preserved on positives") {
    // the IBM representation of positive numbers compares like the
    // numbers themselves (same property IEEE has) — a cheap global
    // structure check that catches exponent-bias mistakes
    val g: Gen[(Double, Double)] = for {
      a <- Gen.choose(1e-60, 1e60)
      b <- Gen.choose(1e-60, 1e60)
    } yield (a, b)
    samples(g, 1000, 99L).foreach { case (a, b) =>
      val (ia, ib) = (SasXport.ieeeToIbm(a), SasXport.ieeeToIbm(b))
      assert((a < b) == (ia < ib) || a == b, s"$a vs $b -> $ia vs $ib")
    }
  }

  test("IBM hex-float: out-of-range and non-finite fail loudly") {
    intercept[IllegalArgumentException](SasXport.ieeeToIbm(Double.NaN))
    intercept[IllegalArgumentException](SasXport.ieeeToIbm(Double.PositiveInfinity))
    intercept[IllegalArgumentException](SasXport.ieeeToIbm(1e200)) // > 16^63
    intercept[IllegalArgumentException](SasXport.ieeeToIbm(java.lang.Double.MIN_VALUE))
  }
}

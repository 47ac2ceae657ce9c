package graft

import graft.functions.TextKernels
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Pure properties of the LSH constructions (no Spark session needed).
  * Exhaustive where the space is small; seeded sweeps elsewhere. */
class LshPropsSpec extends AnyFunSuite {

  test("simhash banding pigeonhole: hamming <= 3 implies a shared nibble band") {
    // the dedup_simhash_pairs candidate join on 4 nibble-bands is LOSSLESS
    // for hamming <= 3: 3 flipped bits cannot touch all 4 bands.
    // Exhaustive over all (x, <=3-bit flip masks).
    val masks = (0 until 16).flatMap(a => (a until 16).flatMap(b => (b until 16).map(c =>
      (1 << a) | (1 << b) | (1 << c)))).distinct
    val rng = new Random(1)
    (0 until 2000).foreach { _ =>
      val x = rng.nextInt(1 << 16)
      masks.foreach { m =>
        val y    = x ^ m
        val band = (0 until 4).exists(b => ((x >> (4 * b)) & 15) == ((y >> (4 * b)) & 15))
        assert(band, s"x=$x m=$m")
      }
    }
  }

  test("simhash64 banding pigeonhole: hamming <= 3 implies a shared 16-bit band") {
    // the production 64-bit variant: 4 bands of 16 bits, hash carried as
    // two 32-bit halves (hi, lo). 3 flipped bits cannot touch all 4 bands.
    // Seeded sweep over random hashes × random <=3-bit flip masks.
    val rng = new Random(41)
    def slices(hi: Long, lo: Long): Seq[Long] =
      Seq(lo & 65535L, (lo >> 16) & 65535L, hi & 65535L, (hi >> 16) & 65535L)
    (0 until 20000).foreach { _ =>
      val hi = rng.nextLong() & 0xFFFFFFFFL
      val lo = rng.nextLong() & 0xFFFFFFFFL
      val bits = Seq.fill(1 + rng.nextInt(3))(rng.nextInt(64)).distinct
      val (fhi, flo) = bits.foldLeft((hi, lo)) { case ((h, l), b) =>
        if (b < 32) (h, l ^ (1L << b)) else (h ^ (1L << (b - 32)), l)
      }
      val hamming = java.lang.Long.bitCount(hi ^ fhi) + java.lang.Long.bitCount(lo ^ flo)
      assert(hamming <= 3)
      assert(slices(hi, lo).zip(slices(fhi, flo)).exists { case (a, b) => a == b },
        s"hi=$hi lo=$lo bits=$bits")
    }
  }

  test("minhash family values are in [0, P) with no int64 overflow") {
    val rng = new Random(2)
    (0 until 100000).foreach { _ =>
      val h = rng.nextLong() & 0xFFFFFFFFL // hex32 range
      val j = rng.nextInt(8)
      val prod = h * TextKernels.minhashA(j)
      assert(prod >= 0, "overflow") // ANSI mode would throw in-plan
      val mh = (prod + TextKernels.minhashB(j)) % TextKernels.MinhashP
      assert(mh >= 0 && mh < TextKernels.MinhashP)
    }
  }

  test("minhash multipliers are odd and the family is distinct") {
    val as = (0 until 8).map(TextKernels.minhashA)
    assert(as.forall(a => a % 2 == 1))
    assert(as.distinct.size == 8)
    assert((0 until 8).map(TextKernels.minhashB).distinct.size == 8)
  }

  test("minhash is order-free and monotone under set union") {
    def mh(j: Int, s: Seq[Long]) =
      s.map(h => (h * TextKernels.minhashA(j) + TextKernels.minhashB(j)) % TextKernels.MinhashP).min
    val rng = new Random(3)
    (0 until 2000).foreach { _ =>
      val xs = Seq.fill(1 + rng.nextInt(50))(rng.nextLong() & 0xFFFFFFFFL)
      (0 until 8).foreach { j =>
        assert(mh(j, xs) == mh(j, rng.shuffle(xs)))
        assert(mh(j, xs :+ (rng.nextLong() & 0xFFFFFFFFL)) <= mh(j, xs))
      }
    }
  }
}

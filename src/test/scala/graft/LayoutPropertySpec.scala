package graft

import org.apache.spark.sql.graft.{CharEntropy, HilbertIndex, WinnowFingerprints}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property coverage for the final-session native expressions — driver
  * replays across shapes the hand specs don't reach. Fixed-seed
  * generators (deterministic CI); the expression OBJECT methods are the
  * same code both eval and codegen paths call, and the Spark-path parity
  * with those methods is pinned by the per-operator specs, so the
  * properties here exercise the algorithm itself at breadth.
  */
class LayoutPropertySpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private def hilbertEval(qx: Long, qy: Long, bits: Int): Long = {
    // evaluate through the expression's interpreted path
    import org.apache.spark.sql.catalyst.expressions.Literal
    HilbertIndex(Literal(qx), Literal(qy), bits).eval(null).asInstanceOf[Long]
  }

  test("hilbert: bijection + unit-step adjacency at every depth 1..6") {
    (1 to 6).foreach { bits =>
      val n = 1 << bits
      val cells = for { x <- 0L until n; y <- 0L until n } yield (x, y)
      val d = cells.map { case (x, y) => ((x, y), hilbertEval(x, y, bits)) }
      assert(d.map(_._2).sorted == (0L until n.toLong * n).toVector, s"bits=$bits")
      val byD = d.sortBy(_._2).map(_._1)
      byD.sliding(2).foreach { case Seq((x0, y0), (x1, y1)) =>
        assert(math.abs(x1 - x0) + math.abs(y1 - y0) == 1, s"bits=$bits")
      }
    }
  }

  test("hilbert: nested prefix property — high-bit quadrant owns a contiguous d range") {
    val bits = 8
    val n = 1L << bits
    val quadOf = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.ArrayBuffer[Long]]
    for (x <- 0L until n; y <- 0L until n) {
      val d = hilbertEval(x, y, bits)
      val quad = ((x >> (bits - 1)) << 1) | (y >> (bits - 1))
      quadOf.getOrElseUpdate(quad, scala.collection.mutable.ArrayBuffer.empty) += d
    }
    // each top-level quadrant's d values form one contiguous quarter
    quadOf.values.foreach { ds =>
      assert(ds.max - ds.min + 1 == ds.size && ds.size == n * n / 4)
    }
  }

  test("winnowing: guarantee and density hold on random strings") {
    val gen = for {
      len <- Gen.chooseNum(0, 300)
      cs <- Gen.listOfN(len, Gen.alphaLowerChar)
    } yield cs.mkString
    (1L to 40L).foreach { seed =>
      val s = sample(gen, seed)
      val picks = WinnowFingerprints.select(s, 8, 4)
      val m = s.length - 8 + 1
      if (m < 4) assert(picks.isEmpty, s"'$s'")
      else {
        // positions strictly increasing, in range, hash < 2^32
        val pos = picks.map(_ >> 32)
        assert(pos.toSeq == pos.toSeq.sorted && pos.toSeq.distinct.size == pos.length)
        assert(pos.forall(p => p >= 0 && p < m))
        assert(picks.forall(p => (p & 0xFFFFFFFFL) < 4294967296L))
        // every window [j, j+3] contains at least one selected position
        // (the winnowing covering guarantee)
        val sel = pos.toSet
        (0 to m - 4).foreach { j =>
          assert((j until j + 4).exists(o => sel(o.toLong)), s"window $j uncovered")
        }
      }
    }
  }

  test("entropy: bounds, permutation invariance, concatenation monotonicity") {
    val gen = for {
      len <- Gen.chooseNum(1, 400)
      cs <- Gen.listOfN(len, Gen.oneOf(('a' to 'f') ++ Seq(' ', '.')))
    } yield cs.mkString
    (1L to 40L).foreach { seed =>
      val s = sample(gen, seed)
      val e = CharEntropy.entropy(s)
      val k = s.codePoints().toArray.distinct.length
      assert(e >= -1e-12 && e <= math.log(k.toDouble) + 1e-12, s"'$s'")
      // permutation invariance: entropy depends only on the histogram
      val shuffled = new String(new scala.util.Random(seed).shuffle(s.toList).toArray)
      assert(math.abs(CharEntropy.entropy(shuffled) - e) < 1e-12)
      // doubling the string changes nothing (same distribution)
      assert(math.abs(CharEntropy.entropy(s + s) - e) < 1e-12)
    }
  }
}

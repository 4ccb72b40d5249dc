package graft.text

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** The winnowing GUARANTEE (Schleimer et al. 2003, Theorem: any match
  * of length >= t + k - 1 shares a fingerprint) is the reason the
  * operator exists — so it gets a property test, not examples: two
  * documents sharing a contiguous token run of length k+t-1 MUST share
  * at least one fingerprint, because the shared run contains a full
  * t-window of shared gram hashes and that window's minimum is
  * selected in both documents. Also pins determinism and the
  * short-document contract.
  */
class WinnowSpec extends AnyFunSuite {
  private val K = 3
  private val T = 4
  private val MinShared = K + T - 1 // 6 tokens

  private def forAll[A](g: Gen[A], n: Int = 300)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      f(g.pureApply(Gen.Parameters.default.withSize(40), org.scalacheck.rng.Seed(i.toLong)))
    }

  private val tok: Gen[String] = Gen.choose(0, 30).map(i => s"w$i")
  private def toks(min: Int, max: Int): Gen[List[String]] =
    Gen.choose(min, max).flatMap(n => Gen.listOfN(n, tok))

  test("guarantee: a shared run of k+t-1 tokens implies a shared fingerprint") {
    val g = Gen.zip(toks(0, 20), toks(MinShared, 12), toks(0, 20), toks(0, 20), toks(0, 20))
    forAll(g) { case (pre1, shared, suf1, pre2, suf2) =>
      val d1 = pre1 ++ shared ++ suf1
      val d2 = pre2 ++ shared ++ suf2
      val f1 = TextOps.winnowKernel(d1, K, T).toSet
      val f2 = TextOps.winnowKernel(d2, K, T).toSet
      assert(f1.intersect(f2).nonEmpty,
        s"no shared fingerprint despite shared run: d1=$d1 d2=$d2")
    }
  }

  test("fingerprints are a subset of the doc's own gram hashes; deterministic") {
    forAll(toks(MinShared, 40)) { d =>
      val grams = (0 to d.length - K).map(i => TextOps.hash60(d.slice(i, i + K).mkString(" "))).toSet
      val fp = TextOps.winnowKernel(d, K, T)
      assert(fp.toSet.subsetOf(grams))
      assert(fp == TextOps.winnowKernel(d, K, T)) // pure function
      assert(fp == fp.distinct.sorted) // contract: sorted-distinct
    }
  }

  test("short documents yield no fingerprints; null is empty") {
    forAll(toks(0, MinShared - 1)) { d =>
      assert(TextOps.winnowKernel(d, K, T).isEmpty)
    }
    assert(TextOps.winnowKernel(null, K, T).isEmpty)
  }
}

package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.TextHashes

/** Property-based tests over the pure hash/similarity kernels the custom
  * Catalyst expressions call: these run per-row on 100 TB, so their
  * invariants (determinism, bounds, symmetry) must hold for ARBITRARY
  * input, not just the corpus the specs sample. Pure JVM — no Spark
  * session. (ScalaCheck generators driven by a fixed seed — the
  * scalatest bridge artifact is not in the offline cache.)
  */
class KernelPropertySpec extends AnyFunSuite {

  private def forAll[A](g: Gen[A], n: Int = 300)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var produced = 0
    while (produced < n) {
      g.apply(Gen.Parameters.default, seed).foreach { a => f(a); produced += 1 }
      seed = seed.next
    }
  }

  private def forAll2[A, B](ga: Gen[A], gb: Gen[B], n: Int = 300)(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb), n) { case (a, b) => f(a, b) }

  private def forAll3[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C], n: Int = 300)(
      f: (A, B, C) => Unit): Unit =
    forAll(Gen.zip(ga, gb, gc), n) { case (a, b, c) => f(a, b, c) }

  private def whenever(cond: Boolean)(f: => Unit): Unit = if (cond) f

  private val text: Gen[String] =
    Gen.chooseNum(0, 200).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        8 -> Gen.alphaNumChar, 2 -> Gen.const(' '))).map(_.mkString))

  private val floats: Gen[Array[Float]] =
    Gen.chooseNum(1, 64).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-100f, 100f)).map(_.toArray))

  private def u(s: String) = UTF8String.fromString(s)

  test("simhash64 and rollingMinHash are deterministic") {
    forAll(text) { s =>
      assert(TextHashes.simhash64(u(s)) == TextHashes.simhash64(u(s)))
      assert(TextHashes.rollingMinHash(u(s), 16) == TextHashes.rollingMinHash(u(s), 16))
    }
  }

  test("minhashSig has exactly k entries and is deterministic") {
    forAll2(text, Gen.chooseNum(1, 64)) { (s, k) =>
      val sig = TextHashes.minhashSig(u(s), k)
      assert(sig.length == k)
      assert(sig.sameElements(TextHashes.minhashSig(u(s), k)))
    }
  }

  test("jaccard kernels are bounded, symmetric, and 1 on self") {
    forAll2(text, text) { (a, b) =>
      val j = TextHashes.ngramJaccard(u(a), u(b), 4)
      assert(j >= 0.0 && j <= 1.0)
      assert(j == TextHashes.ngramJaccard(u(b), u(a), 4))
      val sj = TextHashes.shingleJaccard(u(a), u(b))
      assert(sj >= 0.0 && sj <= 1.0)
      assert(sj == TextHashes.shingleJaccard(u(b), u(a)))
    }
    forAll(text) { a =>
      whenever(a.length >= 4) {
        assert(TextHashes.ngramJaccard(u(a), u(a), 4) == 1.0)
      }
    }
  }

  test("containment kernel: bounded, 1 on self and on any superstring, Jaccard-consistent") {
    forAll2(text, text) { (a, b) =>
      val c = TextHashes.shingleContainment(u(a), u(b))
      assert(c >= 0.0 && c <= 1.0)
      // A is contained in A ++ junk up to the BOUNDARY shingles: the final
      // partial shingles of A continue into the junk in the superstring,
      // so up to ~2 tail shingles may differ — never more
      val tokens = a.trim.split("\\s+").count(_.nonEmpty)
      if (tokens >= 8) {
        val cSup = TextHashes.shingleContainment(u(a), u(a + " zz qq ww"))
        assert(cSup >= 1.0 - 3.0 / tokens,
          s"superstring containment $cSup too low for $tokens tokens")
      }
      // relation to Jaccard: J(A,B) <= C(A,B) always (same intersection,
      // bigger denominator)
      val j = TextHashes.shingleJaccard(u(a), u(b))
      assert(j <= c + 1e-12, s"J=$j > C=$c for ('$a','$b')")
    }
    forAll(text) { a =>
      assert(TextHashes.shingleContainment(u(a), u(a)) == 1.0)
    }
  }

  test("cosineF is bounded, symmetric, and 1 on self") {
    forAll2(floats, floats) { (a, b) =>
      val c = TextHashes.cosineF(a, b)
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
      assert(c == TextHashes.cosineF(b, a))
    }
    forAll(floats) { a =>
      whenever(a.exists(_ != 0f)) {
        assert(math.abs(TextHashes.cosineF(a, a) - 1.0) < 1e-9)
      }
    }
  }

  test("hyperplaneBucket stays in [0, 2^planes) and depends on the salt") {
    forAll3(floats, Gen.chooseNum(1, 12), Gen.chooseNum(0, 16)) { (emb, planes, salt) =>
      val b = TextHashes.hyperplaneBucket(emb, planes, salt)
      assert(b >= 0 && b < (1 << planes))
      assert(b == TextHashes.hyperplaneBucket(emb, planes, salt))
    }
  }

  test("rollingMinHash: appending a suffix never raises the fingerprint (admission-key robustness)") {
    // every 16-char window fully inside s is also a window of s ++ t, so
    // the unsigned min over s ++ t's windows is <= the min over s's — the
    // formal statement behind doc_stream_curate_near's claim that a
    // lightly-edited re-crawl usually KEEPS its fingerprint (the min can
    // only move if a new window hashes strictly lower)
    forAll2(text, text) { (s, t) =>
      whenever(s.length >= 16) {
        val base = TextHashes.rollingMinHash(u(s), 16)
        val appended = TextHashes.rollingMinHash(u(s + t), 16)
        assert(java.lang.Long.compareUnsigned(appended, base) <= 0,
          s"suffix raised the fingerprint: s=${s.take(40)} t=${t.take(20)}")
      }
    }
  }

  test("near-identical strings keep higher shingle jaccard than unrelated ones") {
    forAll(text) { s =>
      whenever(s.split(" ").count(_.nonEmpty) >= 6) {
        val tweaked = s + " zz"
        val self = TextHashes.shingleJaccard(u(s), u(tweaked))
        val other = TextHashes.shingleJaccard(u(s), u("completely different words here entirely"))
        assert(self >= other)
      }
    }
  }

  private val doubles: Gen[List[Double]] =
    Gen.chooseNum(0, 3000).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(
        Gen.chooseNum(-1e6, 1e6),
        Gen.chooseNum(-10.0, 10.0),
        Gen.oneOf(0.0, 1.0, -1.0, 1e-9, 1e9)))) // duplicates + extremes

  /** Tie-aware rank error: a value with duplicates covers a rank INTERVAL
    * [count(<v)/n, count(<=v)/n]; the estimate is correct when p falls
    * inside it, else the distance to the nearest end.
    */
  private def sketchRankError(values: List[Double], est: Double, p: Double): Double = {
    val n = values.length.toDouble
    val below = values.count(_ < est) / n
    val upTo = values.count(_ <= est) / n
    if (p >= below && p <= upTo) 0.0
    else math.min(math.abs(p - below), math.abs(p - upTo))
  }

  test("quantile sketch rank error bounded for arbitrary inputs (k=100)") {
    import graft.functions.QuantileSketch
    forAll2(doubles, Gen.oneOf(0.1, 0.5, 0.9, 0.99), n = 120) { (vs, p) =>
      whenever(vs.nonEmpty) {
        val sk = new QuantileSketch(100)
        vs.foreach(sk.insert)
        assert(sk.n == vs.length)
        val err = sketchRankError(vs, sk.quantile(p), p)
        // 5% rank bound at k=100, plus the 1/n discretization floor (a
        // step-quantile over n values can't rank finer than 1/n)
        assert(err <= 0.05 + 1.0 / vs.length,
          s"rank err $err at p=$p over ${vs.length} values")
      }
    }
  }

  test("quantile sketch merge equals bounded single-pass for arbitrary splits") {
    import graft.functions.QuantileSketch
    forAll2(doubles, Gen.chooseNum(0.0, 1.0), n = 80) { (vs, cut) =>
      whenever(vs.length >= 2) {
        val at = math.max(1, math.min(vs.length - 1, (vs.length * cut).toInt))
        val (l, r) = vs.splitAt(at)
        val a = new QuantileSketch(100); l.foreach(a.insert)
        val b = new QuantileSketch(100); r.foreach(b.insert)
        val m = a.merge(b)
        assert(m.n == vs.length)
        Seq(0.5, 0.95).foreach { p =>
          val err = sketchRankError(vs, m.quantile(p), p)
          assert(err <= 0.05 + 1.0 / vs.length,
            s"post-merge rank err $err at p=$p, split $at/${vs.length}")
        }
      }
    }
  }

  private val floatGen: Gen[Float] =
    Gen.chooseNum(-8.0f, 8.0f)

  test("pqCodes picks the true squared-L2 argmin with first-min tie-break") {
    val m = 2; val k = 4; val d = 3
    val vecGen = Gen.listOfN(m * d, floatGen).map(_.toArray)
    val cbGen = Gen.listOfN(m * k * d, floatGen).map(_.toArray)
    forAll2(vecGen, cbGen, n = 200) { (v, cb) =>
      val codes = TextHashes.pqCodes(v, cb, m, k, d)
      assert(codes.length == m)
      for (s <- 0 until m) {
        assert(codes(s) >= 0 && codes(s) < k)
        // naive reference argmin
        val dists = (0 until k).map { c =>
          (0 until d).map { j =>
            val diff = v(s * d + j).toDouble - cb((s * k + c) * d + j).toDouble
            diff * diff
          }.sum
        }
        assert(dists(codes(s)) == dists.min, s"sub $s: not the min")
        assert(codes(s) == dists.indexOf(dists.min), s"sub $s: not the FIRST min")
      }
    }
  }

  test("pqAdc equals the explicit per-subspace table sum") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val m = 3; val k = 5
    val codesGen = Gen.listOfN(m, Gen.chooseNum(0, k - 1)).map(_.toArray)
    val tabGen = Gen.listOfN(m * k, Gen.chooseNum(0.0, 50.0)).map(_.toArray)
    forAll2(codesGen, tabGen, n = 200) { (codes, tab) =>
      val got = TextHashes.pqAdc(
        ArrayData.toArrayData(codes), ArrayData.toArrayData(tab), k)
      val want = (0 until m).map(s => tab(s * k + codes(s))).sum
      assert(got == want)
    }
  }

  test("unigramSegment always reconstructs the word and never exceeds maxLen") {
    val word: Gen[String] = Gen.chooseNum(1, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString))
    val unk = -25.0 * math.log(2)
    forAll2(word, Gen.chooseNum(0, 30), n = 300) { (w, nPieces) =>
      // vocab: random substrings of the word itself + unrelated noise
      val subs = (for {
        i <- 0 until w.length
        l <- 1 to math.min(6, w.length - i)
      } yield w.substring(i, i + l)).distinct
      val vocab = (subs.take(nPieces) ++ Seq("zz", "qqq"))
        .map(p => p -> math.log(0.5) * p.length).toMap
      val pieces = graft.operators.Text.unigramSegment(w, vocab, 6, unk)
      assert(pieces.mkString("") === w, s"'$w' segmented to $pieces")
      assert(pieces.forall(_.length <= 6), s"overlong piece in $pieces")
      assert(pieces.forall(_.nonEmpty))
    }
  }
}

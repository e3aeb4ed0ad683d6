package graft.functions

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property-based checks of the pure sketch kernels (no Spark session —
  * these are the single-pass loops the native expressions call).
  */
object SketchProps extends Properties("sketches") {

  private val text: Gen[String] = Gen.chooseNum(0, 400).flatMap(n =>
    Gen.stringOfN(n, Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.oneOf(' ', ' ', '\t', '.', ','))))

  property("fingerprint32 ∈ [0, 2^31-1) and deterministic") =
    forAll(text) { s =>
      val h = Fingerprint32.hash(s)
      h >= 0L && h < 2147483647L && h == Fingerprint32.hash(s)
    }

  property("fingerprint32 matches the documented polynomial exactly") =
    forAll(text) { s =>
      var h = BigInt(0)
      s.codePoints().toArray.foreach(cp => h = (h * 31 + cp) mod BigInt(2147483647L))
      Fingerprint32.hash(s) == h.toLong
    }

  property("minhash signature: values ∈ [0, M), identical input → identical sig") =
    forAll(text, Gen.oneOf(16, 64, 128)) { (s, n) =>
      val a = MinHashSig.compute(s, n, 3)
      val b = MinHashSig.compute(s, n, 3)
      a.length == n && a.forall(v => v >= 0 && v <= 2147483647L) &&
        a.sameElements(b)
    }

  property("oph signature: deterministic, full length, no unfilled slots") =
    forAll(text, Gen.oneOf(16, 64, 128)) { (s, n) =>
      val a = MinHashSig.computeOph(s, n, 3)
      val b = MinHashSig.computeOph(s, n, 3)
      a.length == n && a.sameElements(b) && a.forall(_ != Long.MaxValue) &&
        a.forall(_ >= 0L)
    }

  property("oph originally-filled bins equal the dense single-hash minima semantics: " +
    "bin minima only shrink under concatenation") =
    forAll(text.suchThat(_.length >= 3), text.suchThat(_.length >= 3)) { (s, t) =>
      // concatenation adds shingles; every bin that was non-empty for s
      // keeps a value ≤ its old one in s+t (filled minima are monotone;
      // densified slots may change arbitrarily, so compare only bins that
      // are filled in BOTH — approximated here by bins whose value is
      // reproduced by re-running on s alone)
      val k = 32
      val a = MinHashSig.computeOph(s, k, 3)
      val ab = MinHashSig.computeOph(s + t, k, 3)
      // weaker but sound invariant: the global minimum never increases
      ab.min <= a.min
    }

  property("minhash: concatenation only adds shingles → per-slot min shrinks") =
    forAll(text.suchThat(_.length >= 3), text.suchThat(_.length >= 3)) { (s, t) =>
      // shingles(s+t) ⊇ shingles(s) ∪ shingles(t), so every signature slot
      // of the concat is ≤ the min of the parts' slots
      val st = MinHashSig.compute(s + t, 32, 3)
      val a = MinHashSig.compute(s, 32, 3)
      val b = MinHashSig.compute(t, 32, 3)
      st.indices.forall(k => st(k) <= math.min(a(k), b(k)))
    }

  property("minhash bands = banded fold of the signature") =
    forAll(text) { s =>
      val bands = MinHashBands.compute(s, 64, 4, 8)
      val sig = MinHashSig.compute(s, 64, 4)
      val expect = (0 until 8).map { b =>
        var h = 0xCBF29CE484222325L ^ b
        (0 until 8).foreach(j => h = (h ^ sig(b * 8 + j)) * 0x100000001B3L)
        h
      }
      bands.sameElements(expect)
    }

  property("simhash is invariant to leading/trailing/repeated whitespace") =
    forAll(text) { s =>
      val squeezed = s.trim.split("\\s+").filter(_.nonEmpty).mkString(" ")
      SimHash64.compute("  " + s + "\t") == SimHash64.compute(s) &&
        SimHash64.compute(squeezed) == SimHash64.compute(s)
    }

  property("binary features: unit norm (or zero vector), deterministic") =
    forAll(Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte)), Gen.oneOf(4, 16, 64)) {
      (bytes, dim) =>
        val arr = bytes.toArray
        val f = BinaryFeatures.compute(arr, dim)
        val norm = math.sqrt(f.map(x => x.toDouble * x).sum)
        f.length == dim &&
          (math.abs(norm - 1.0) < 1e-5 || norm == 0.0) &&
          f.sameElements(BinaryFeatures.compute(arr, dim))
    }
}

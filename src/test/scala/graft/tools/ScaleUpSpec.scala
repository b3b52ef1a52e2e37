package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** The ScaleUp mutators are pure functions of (id, copy, position) — the
  * property every decade-ratio measurement rests on: two builds of the
  * same mutated corpus must be byte-identical, and copy 0 must stay
  * verbatim so every replicated entity keeps one true original.
  */
class ScaleUpSpec extends AnyFunSuite {

  test("mutateText: copy 0 verbatim, deterministic, light/heavy rates") {
    val text = (1 to 200).map(i => s"tok$i").mkString(" ")
    assert(ScaleUp.mutateText(text, 7L, 0) == text)
    assert(ScaleUp.mutateText(null, 7L, 1) == null)
    val a = ScaleUp.mutateText(text, 7L, 3)
    assert(a == ScaleUp.mutateText(text, 7L, 3), "must be deterministic")
    assert(a != ScaleUp.mutateText(text, 7L, 4), "copies must differ")
    // replacement rate lands near 2% (light) or 40% (heavy), never both
    def rate(docId: Long, copy: Int): Double = {
      val out = ScaleUp.mutateText(text, docId, copy).split(" ")
      out.count(_.startsWith(s"m${copy}q")).toDouble / out.length
    }
    val rates = (1 to 25).map(c => rate(11L, c))
    assert(rates.exists(_ < 0.1) && rates.exists(_ > 0.25),
      s"expected a light/heavy mix, got $rates")
    assert(rates.forall(r => r < 0.1 || (r > 0.25 && r < 0.55)))
  }

  test("mutateVec: copy 0 verbatim, deterministic, light stays near-dup, heavy does not") {
    val v: Seq[Float] = (1 to 32).map(i => (math.sin(i.toDouble) * 0.3).toFloat)
    assert(ScaleUp.mutateVec(v, 5L, 0) == v)
    assert(ScaleUp.mutateVec(null, 5L, 1) == null)
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      }
      d / math.sqrt(na * nb)
    }
    val cosines = (1 to 25).map { c =>
      val m = ScaleUp.mutateVec(v, 5L, c)
      assert(m == ScaleUp.mutateVec(v, 5L, c), "must be deterministic")
      cos(v, m)
    }
    // light copies (±2%·RMS) stay inside any near-dup eps; heavy copies
    // (±10·RMS, i.e. noise-dominated) behave like FRESH random vectors:
    // always far below the semantic eps=0.9, with residual cosine noise
    // of the same magnitude fresh vectors carry at this dimension
    // (mean ≈ 0.17 ± 1/√dim — the fixture's own 0.3 "near-dup band"
    // exists precisely because random vectors occasionally reach it)
    val (light, heavy) = cosines.partition(_ > 0.99)
    assert(light.nonEmpty && heavy.nonEmpty,
      s"expected light and heavy copies, got $cosines")
    assert(heavy.forall(_ < 0.6), s"heavy copies too correlated: $heavy")
    assert(heavy.sum / heavy.length < 0.3,
      s"heavy mean too high: ${heavy.sum / heavy.length}")
    // the light/heavy decision matches the TEXT mutator's hash, so a
    // document and its embedding agree on which copies are near-dups
    val text = (1 to 50).map(i => s"w$i").mkString(" ")
    (1 to 25).foreach { c =>
      val lightText = {
        val out = ScaleUp.mutateText(text, 5L, c).split(" ")
        out.count(_.startsWith(s"m${c}q")).toDouble / out.length < 0.1
      }
      val lightVec = cos(v, ScaleUp.mutateVec(v, 5L, c)) > 0.6
      assert(lightText == lightVec, s"copy $c disagrees on light/heavy")
    }
  }
}

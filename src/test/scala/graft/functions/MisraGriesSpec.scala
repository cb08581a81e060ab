package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import scala.collection.mutable

/** [[MisraGriesAggregator]] — the property that makes the exact
  * heavy-hitter operator correct is the SURVIVAL GUARANTEE: however the
  * stream is partitioned and however the partials merge, no token with
  * frequency > N/k ever leaves the sketch. ScalaCheck drives random
  * streams through random partition/merge trees. */
class MisraGriesSpec extends AnyFunSuite {

  private val k = 8

  /** Skewed token stream: few hot tokens over a long tail. */
  private val streamGen: Gen[List[String]] =
    Gen.listOf(Gen.frequency(
      4 -> Gen.oneOf("hot1", "hot2", "hot3"),
      6 -> Gen.chooseNum(0, 500).map(i => s"t$i")))

  private def runSketch(parts: Seq[Seq[String]]): Set[String] = {
    val agg = new MisraGriesAggregator(k)
    val partials = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
    val merged =
      if (partials.isEmpty) agg.zero
      else partials.reduceLeft((a, b) => agg.merge(a, mutable.Map(b.toSeq: _*)))
    agg.finish(merged).toSet
  }

  test("survival guarantee holds over random streams and merge trees (ScalaCheck)") {
    val p = Prop.forAll(streamGen, Gen.chooseNum(1, 5)) { (xs: List[String], nParts: Int) =>
      val parts = if (xs.isEmpty) Seq(Seq.empty[String])
        else xs.grouped(math.max(1, xs.length / nParts)).toSeq
      val cands = runSketch(parts)
      val n = xs.length
      val freq = xs.groupBy(identity).view.mapValues(_.length).toMap
      val mustSurvive = freq.collect { case (t, f) if f.toLong * k > n => t }.toSet
      mustSurvive.subsetOf(cands) && cands.size <= k - 1
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  test("bounded state: the buffer never exceeds k-1 counters mid-stream") {
    val agg = new MisraGriesAggregator(k)
    var b = agg.zero
    (1 to 5000).foreach { i =>
      b = agg.reduce(b, s"t${i % 137}")
      assert(b.size <= k - 1, s"buffer grew to ${b.size} at step $i")
      assert(b.values.forall(_ > 0L), "non-positive counter retained")
    }
  }

  test("null inputs are ignored, matching SQL aggregate semantics") {
    val agg = new MisraGriesAggregator(k)
    val b = Seq("a", null, "a", null).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(b) == Seq("a"))
  }
}

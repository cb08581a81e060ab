package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** F1 unit + property coverage (SURVEY §5 #1, #4). Ground truths from the
  * reference's `isodate.parse_duration(...).total_seconds()` semantics
  * (dags/trending_daily_ingestion.py:40-42). */
class IsoDurationSpec extends AnyFunSuite {

  private def parse(s: String): Option[Long] = {
    val r = IsoDuration.parseSecondsOrMin(UTF8String.fromString(s))
    if (r == Long.MinValue) None else Some(r)
  }

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("reference duration shapes") {
    assert(parse("PT3M59S") === Some(239L))     // assets/2025-10-06.json:64 shape
    assert(parse("PT1H2M3S") === Some(3723L))
    assert(parse("P1DT1S") === Some(86401L))
    assert(parse("P2W") === Some(1209600L))
    assert(parse("PT0S") === Some(0L))
    assert(parse("PT45S") === Some(45L))
    assert(parse("P3D") === Some(259200L))
  }

  test("malformed inputs map to null, not garbage") {
    for (bad <- Seq("", "P", "PT", "X", "PT5X", "3M59S", "P1H", "PT1D", "pt3m",
                    "PT" + "9" * 19 + "S"))
      assert(parse(bad) === None, s"input: $bad")
    assert(parse(null) === None)
  }

  test("overflow-boundary inputs are rejected, not wrapped") {
    assert(parse(s"P${Long.MaxValue / 86400 + 1}D") === None)
    assert(parse(s"P${Long.MaxValue / 604800 + 1}W") === None)
    // just-under-the-boundary values still parse (guard is not over-eager)
    assert(parse(s"P${Long.MaxValue / 86400}D") ===
      Some(Long.MaxValue / 86400 * 86400L))
  }

  test("property: P{d}DT{h}H{m}M{s}S round-trips to exact seconds") {
    val g = for {
      d <- Gen.choose(0, 10000); h <- Gen.choose(0, 100)
      m <- Gen.choose(0, 100);   s <- Gen.choose(0, 100)
    } yield (d, h, m, s)
    check(Prop.forAll(g) { case (d, h, m, s) =>
      parse(s"P${d}DT${h}H${m}M${s}S") ==
        Some(d * 86400L + h * 3600L + m * 60L + s)
    })
  }

  test("property: PT{m}M{s}S (the common YouTube shape)") {
    check(Prop.forAll(Gen.choose(0, 600), Gen.choose(0, 600)) { (m, s) =>
      parse(s"PT${m}M${s}S") == Some(m * 60L + s)
    })
  }
}

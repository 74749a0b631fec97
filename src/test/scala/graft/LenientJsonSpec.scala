package graft

import graft.expr.LenientJson
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests mirroring the reference's safe_parse_passback contract
  * (/root/reference/main.py:94-101): total function, JSON accepted,
  * Python-literal dialect accepted, garbage → {} (SURVEY §5.2-3).
  * Plain scalacheck generators with a fixed seed (no scalatestplus in the
  * offline jar set).
  */
class LenientJsonSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int = 200): Seq[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(42L))

  test("valid JSON object round-trips") {
    assert(LenientJson.parseToMap("""{"k": 87}""") == Map("k" -> "87"))
    assert(
      LenientJson.parseToMap("""{"a": "x", "b": null, "c": true}""") ==
        Map("a" -> "x", "b" -> null, "c" -> "true"))
  }

  test("python-literal dialect normalizes like ast.literal_eval") {
    assert(
      LenientJson.parseToMap("{'a': True, 'b': None, 'c': 'x'}") ==
        Map("a" -> "true", "b" -> null, "c" -> "x"))
    assert(
      LenientJson.parseToMap("{'lis_result_sourcedid': '12:34'}") ==
        Map("lis_result_sourcedid" -> "12:34"))
    // keywords inside string values must NOT be rewritten
    assert(LenientJson.parseToMap("{'a': 'True story'}") == Map("a" -> "True story"))
  }

  test("null / empty / garbage → empty map (main.py:135-136, 99-101)") {
    assert(LenientJson.parseToMap(null) == Map.empty)
    assert(LenientJson.parseToMap("") == Map.empty)
    assert(LenientJson.parseToMap("   ") == Map.empty)
    assert(LenientJson.parseToMap("not json at all") == Map.empty)
    assert(LenientJson.parseToMap("[1, 2, 3]") == Map.empty) // non-object
    assert(LenientJson.parseToMap("{'unclosed': ") == Map.empty)
  }

  test("property: never throws, always yields a map, on arbitrary strings") {
    samples(Gen.asciiPrintableStr).foreach { s =>
      assert(LenientJson.parseToMap(s) != null)
    }
    samples(Gen.listOf(Gen.choose(Char.MinValue, Char.MaxValue)).map(_.mkString))
      .foreach(s => assert(LenientJson.parseToMap(s) != null))
  }

  private val kvGen: Gen[Map[String, String]] = {
    val key = Gen.alphaStr.suchThat(_.nonEmpty).map(_.take(10))
    val value = Gen.alphaNumStr.map(_.take(20))
    Gen.mapOf(Gen.zip(key, value)).map(_.take(8))
  }

  test("property: valid flat JSON string objects round-trip exactly") {
    samples(kvGen, 100).foreach { m =>
      val json = m.map { case (k, v) => s""""$k": "$v"""" }.mkString("{", ", ", "}")
      assert(LenientJson.parseToMap(json) == m)
    }
  }

  test("property: single-quoted literal dicts parse equal to JSON form") {
    samples(kvGen, 100).foreach { m =>
      val py = m.map { case (k, v) => s"'$k': '$v'" }.mkString("{", ", ", "}")
      assert(LenientJson.parseToMap(py) == m)
    }
  }
}

package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** The oracle_sql.json writer must emit strictly-parseable JSON for the
  * driver's json.load — round-trip every oracle through Jackson, plus
  * the nasty-character cases.
  */
class VerifyJsonSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  test("every registered oracle renders to strictly parseable JSON") {
    val json = VerifyJson.render(SparkEntry.oracleSql)
    val node = mapper.readTree(json)
    assert(node.size() === SparkEntry.oracleSql.size)
    SparkEntry.oracleSql.foreach { case (k, v) =>
      assert(node.get(k) != null, s"missing key $k")
      assert(node.get(k).asText() === v, s"value mismatch for $k")
    }
  }

  test("escaper survives quotes, backslashes, and control characters") {
    val nasty = Map(
      "k\"1" -> "line1\nline2\twith\rchars",
      "k\\2" -> "back\\slash \"quoted\" ")
    val node = mapper.readTree(VerifyJson.render(nasty))
    nasty.foreach { case (k, v) => assert(node.get(k).asText() === v) }
  }
}

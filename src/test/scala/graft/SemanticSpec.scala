package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.lexer.Lexer
import graft.parser.Parser
import graft.schema.Schema
import graft.semantic.Semantic

/** Port of the reference semantic suite (reference: test/Test.Main.purs:973-1450):
  * exact error strings and inferred output schemas.
  */
class SemanticSpec extends AnyFunSuite {

  private def analyze(schemaJson: String, query: String): Either[String, Schema] =
    for {
      schema <- Schema.fromString(schemaJson)
      tokens <- Lexer.tokenize(query)
      ast <- Parser.statement(tokens).map(_._1)
      out <- Semantic.analyze(schema, ast)
    } yield out

  private def analyzeShow(schemaJson: String, query: String): Either[String, String] =
    analyze(schemaJson, query).map(_.show)

  test("unknown field in GROUP BY") {
    assert(analyze("""{"autruche": "number"}""", "SELECT autruche GROUP BY patate") ==
      Left("unexisting field 'patate' in GROUP BY expression"))
  }

  test("unknown field in WHERE") {
    assert(analyze("""{"autruche": "number"}""", "SELECT autruche WHERE patate > 14") ==
      Left("unexisting field 'patate' in WHERE expression"))
  }

  test("unknown field in SELECT") {
    assert(analyze("""{"autruche": "number"}""", "SELECT patate") ==
      Left("unexisting field 'patate' in SELECT expression"))
  }

  test("unknown field in ORDER BY") {
    assert(analyze("""{"autruche": "number"}""", "SELECT autruche ORDER BY patate") ==
      Left("unexisting field 'patate' in ORDER BY expression"))
  }

  test("Lt type mismatch: number vs string") {
    assert(analyze("""{"autruche": "number"}""", "SELECT autruche WHERE autruche < \"patate\"") ==
      Left("incompatible types \"number\", \"string\" with binary operator <"))
  }

  test("Lt on booleans rejected") {
    assert(analyze("""{"autruche": "boolean"}""", "SELECT autruche WHERE autruche < true") ==
      Left("incompatible types \"boolean\", \"boolean\" with binary operator <"))
  }

  test("Neq type mismatch: string vs number") {
    assert(analyze("""{"autruche": "string"}""", "SELECT autruche WHERE autruche != 14") ==
      Left("incompatible types \"string\", \"number\" with binary operator !="))
  }

  test("Eq against NULL always well-typed") {
    assert(analyze("""{"autruche": "string"}""", "SELECT autruche WHERE autruche = NULL").isRight)
  }

  test("NOT requires boolean operand") {
    assert(analyze("""{"autruche": "number"}""", "SELECT autruche WHERE NOT(autruche)") ==
      Left("incompatible type \"number\" with unary operator NOT"))
  }

  test("_id is reserved in aggregations (bare)") {
    assert(analyze("""{"_id": "number", "x": "number"}""", "SELECT _id GROUP BY x") ==
      Left("reserved field's name '_id'"))
  }

  test("_id is reserved in aggregations (alias)") {
    assert(analyze("""{"x": "number"}""", "SELECT x AS _id GROUP BY x") ==
      Left("reserved field's name '_id'"))
  }

  test("AVG projection on non-array") {
    assert(analyze("""{"autruche": "string"}""", "SELECT AVG(autruche)") ==
      Left("incompatible type \"string\" with function AVG"))
  }

  test("COUNT projection on non-array") {
    assert(analyze("""{"autruche": "number"}""", "SELECT COUNT(autruche)") ==
      Left("incompatible type \"number\" with function COUNT"))
  }

  test("grouped COUNT output schema keyed by argument name") {
    assert(analyzeShow("""{"age": "number", "name": "string"}""", "SELECT COUNT(age) GROUP BY name") ==
      Right("""{"age":"number","_id":"string"}"""))
  }

  test("grouped plain selector collects into array") {
    assert(analyzeShow("""{"age": "number", "name": "string"}""", "SELECT age GROUP BY name") ==
      Right("""{"age":["number"],"_id":"string"}"""))
  }

  test("GROUP BY NULL yields null _id") {
    assert(analyzeShow("""{"age": "number"}""", "SELECT AVG(age) GROUP BY NULL") ==
      Right("""{"age":"number","_id":"null"}"""))
  }

  test("dotted path alias sanitization") {
    val schema =
      """{"details": {"biographical": {"age": "number"}, "physical": {"height": "number"}}}"""
    assert(analyzeShow(schema, "SELECT details.biographical.age") ==
      Right("""{"details_biographical_age":"number"}"""))
  }

  test("array-of-objects reduction output schema") {
    val schema = """{"spells": [{"name": "string", "power": "number"}]}"""
    assert(analyzeShow(schema, "SELECT MAX(spells.power)") ==
      Right("""{"spells_power":"number"}"""))
    assert(analyzeShow(schema, "SELECT COUNT(spells)") ==
      Right("""{"spells":"number"}"""))
  }

  test("dotted path inside array element structs") {
    val schema = """{"spells": [{"power": {"normal": "number", "super": "number"}}]}"""
    assert(analyzeShow(schema, "SELECT SUM(spells.power.normal)") ==
      Right("""{"spells_power_normal":"number"}"""))
  }

  test("derived table output schema feeds outer query") {
    val schema = """{"a": "number", "b": "string"}"""
    assert(analyzeShow(schema, "SELECT c FROM (SELECT a AS c)") == Right("""{"c":"number"}"""))
    assert(analyze(schema, "SELECT a FROM (SELECT a AS c)") ==
      Left("unexisting field 'a' in SELECT expression"))
  }

  test("schema decode rejections") {
    assert(Schema.fromString("14") == Left("can't decode number to schema"))
    assert(Schema.fromString("true") == Left("can't decode boolean to schema"))
    assert(Schema.fromString("null") == Left("can't decode null to schema"))
    assert(Schema.fromString("""{"a": ["number", "string"]}""") ==
      Left("can't decode array: exactly one element is expected"))
    assert(Schema.fromString("""{"a": "float"}""") == Left("unknown schema's typefloat"))
  }
}

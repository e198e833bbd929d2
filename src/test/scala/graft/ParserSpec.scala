package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.lexer.Lexer
import graft.lexer.Lexer.{Binary, Funktion}
import graft.parser._

/** Port of the reference parser suite (reference: test/Test.Main.purs:179-629). */
class ParserSpec extends AnyFunSuite {

  private def parse(s: String): Either[String, Statement] =
    Lexer.tokenize(s).flatMap(ts => Parser.statement(ts).map(_._1))

  private def ok(s: String): Statement = parse(s).fold(e => fail(s"$s → $e"), identity)

  test("SELECT patate") {
    assert(ok("SELECT patate") ==
      Statement.Select(List(Selector.Field("patate", None)), None, None, Nil, None, None))
  }

  test("SELECT p AS q alias") {
    assert(ok("SELECT p AS q") ==
      Statement.Select(List(Selector.Field("p", Some("q"))), None, None, Nil, None, None))
  }

  test("function selector with alias") {
    assert(ok("SELECT AVG(power) AS p") ==
      Statement.Select(List(Selector.Fn(Funktion.Avg, "power", Some("p"))), None, None, Nil, None, None))
  }

  test("GROUP BY flips constructor") {
    assert(ok("SELECT AVG(age) GROUP BY class") ==
      Statement.Group(Index.IdxField("class"),
        List(Selector.Fn(Funktion.Avg, "age", None)), None, None, Nil, None, None))
  }

  test("GROUP BY NULL is global aggregation") {
    assert(ok("SELECT AVG(age) GROUP BY NULL") ==
      Statement.Group(Index.IdxNull,
        List(Selector.Fn(Funktion.Avg, "age", None)), None, None, Nil, None, None))
  }

  test("FROM takes a nested statement") {
    assert(ok("SELECT a FROM (SELECT b)") ==
      Statement.Select(List(Selector.Field("a", None)),
        Some(Statement.Select(List(Selector.Field("b", None)), None, None, Nil, None, None)),
        None, Nil, None, None))
  }

  test("WHERE with binary condition") {
    assert(ok("SELECT a WHERE age > 14") ==
      Statement.Select(List(Selector.Field("a", None)), None,
        Some(Condition.Term(Term.Fact(Factor.Bin(Binary.Gt,
          Operand.Field("age"), Operand.Num(BigDecimal("14")))))),
        Nil, None, None))
  }

  test("AND is binary only: a AND b AND c fails") {
    assert(parse("SELECT x WHERE (a = 1) AND (b = 2) AND (c = 3)") == Left("unexpected end of input"))
  }

  test("parenthesized chaining works") {
    assert(parse("SELECT x WHERE ((a = 1) AND (b = 2)) AND (c = 3)").isRight)
  }

  test("strict clause order: WHERE after GROUP BY fails") {
    assert(parse("SELECT AVG(a) GROUP BY b WHERE a > 1") == Left("unexpected end of input"))
  }

  test("function arg must be single un-aliased field: AVG(14)") {
    assert(parse("SELECT AVG(14)").isLeft)
  }

  test("function arg must be single un-aliased field: AVG(a, b)") {
    assert(parse("SELECT AVG(a, b)") == Left("AVG has an invalid argument at position 10"))
  }

  test("ORDER BY multi-key with direction") {
    assert(ok("SELECT a ORDER BY b DESC, c") ==
      Statement.Select(List(Selector.Field("a", None)), None, None,
        List(Order.Desc("b"), Order.Asc("c")), None, None))
  }

  test("ORDER BY NULL is a parse error") {
    assert(parse("SELECT a ORDER BY NULL").isLeft)
  }

  test("LIMIT and OFFSET parse as integers") {
    assert(ok("SELECT a LIMIT 14 OFFSET 42") ==
      Statement.Select(List(Selector.Field("a", None)), None, None, Nil, Some(14), Some(42)))
  }

  test("LIMIT must be an integer") {
    assert(parse("SELECT a LIMIT 14.5") == Left("LIMIT must be an integer at position 15"))
  }

  test("NOT parses as unary factor over a parenthesized condition") {
    assert(ok("SELECT a WHERE NOT(ok)") ==
      Statement.Select(List(Selector.Field("a", None)), None,
        Some(Condition.Term(Term.Fact(Factor.Not(Factor.Cond(
          Condition.Term(Term.Fact(Factor.Op(Operand.Field("ok"))))))))),
        Nil, None, None))
  }

  test("DISTINCT is lexed but unparseable") {
    assert(parse("SELECT DISTINCT a").isLeft)
  }

  test("DISTINCT parses under the extensions flag, wrapping the statement") {
    def parseExt(s: String) =
      Lexer.tokenize(s).flatMap(ts => Parser.statement(ts, extensions = true).map(_._1))
    assert(parseExt("SELECT DISTINCT a") == Right(Statement.Distinct(
      Statement.Select(List(Selector.Field("a", None)), None, None, Nil, None, None))))
    // extensions on does not change non-DISTINCT parses
    assert(parseExt("SELECT a") == parse("SELECT a"))
    // subqueries inherit the flag
    assert(parseExt("SELECT a FROM (SELECT DISTINCT a)") == Right(
      Statement.Select(List(Selector.Field("a", None)),
        Some(Statement.Distinct(
          Statement.Select(List(Selector.Field("a", None)), None, None, Nil, None, None))),
        None, Nil, None, None)))
  }
}

/** Edge cases of the generic list/paren rules (reference:
  * src/Ifrit/Parser.purs:405-437, 462-465).
  */
class ParserEdgeSpec extends org.scalatest.funsuite.AnyFunSuite {
  private def parse(s: String) =
    graft.lexer.Lexer.tokenize(s).flatMap(ts => Parser.statement(ts).map(_._1))

  test("parenthesized selector sublists merge: SELECT (a, b), (c)") {
    assert(parse("SELECT (a, b), (c)") == Right(
      Statement.Select(List(
        Selector.Field("a", None), Selector.Field("b", None), Selector.Field("c", None)),
        None, None, Nil, None, None)))
  }

  test("statement may start with an open parenthesis") {
    assert(parse("(SELECT a)") == Right(
      Statement.Select(List(Selector.Field("a", None)), None, None, Nil, None, None)))
  }

  test("parenthesized single selector") {
    assert(parse("SELECT (a AS b)") == Right(
      Statement.Select(List(Selector.Field("a", Some("b"))), None, None, Nil, None, None)))
  }

  test("empty input is an unexpected EOF token") {
    assert(parse("") == Left("unexpected token: EOF at position 0"))
  }

  test("unbalanced parenthesis error names the offending token") {
    // the token stream always ends with an explicit EOF token, so the
    // reference reports it rather than the Nil branch
    assert(parse("SELECT (a, b") ==
      Left("unbalanced parenthesis expression: expected `)` but got: EOF at position 12"))
  }

  test("GROUP BY with parenthesized index") {
    assert(parse("SELECT AVG(x) GROUP BY (y)") == Right(
      Statement.Group(Index.IdxField("y"),
        List(Selector.Fn(graft.lexer.Lexer.Funktion.Avg, "x", None)),
        None, None, Nil, None, None)))
  }

  private def parseX(s: String): Either[String, Statement] =
    Lexer.tokenize(s, extensions = true)
      .flatMap(ts => Parser.statement(ts, extensions = true).map(_._1))

  test("extensions: SELECT * parses; parity mode cannot even lex it") {
    assert(parse("SELECT *") == Left("invalid token '*' at position 7"))
    assert(parseX("SELECT *") == Right(
      Statement.Select(List(Selector.Star), None, None, Nil, None, None)))
    assert(parseX("SELECT *, a") == Right(
      Statement.Select(List(Selector.Star, Selector.Field("a", None)),
        None, None, Nil, None, None)))
  }

  test("extensions: arithmetic projection with mandatory alias and precedence") {
    import NumExpr._
    assert(parseX("SELECT a + b * 2 AS x") == Right(
      Statement.Select(List(Selector.Expr(
        NBin("+", NField("a"), NBin("*", NField("b"), NLit(BigDecimal(2)))), "x")),
        None, None, Nil, None, None)))
    assert(parseX("SELECT (a - 1) / 2 AS y") == Right(
      Statement.Select(List(Selector.Expr(
        NBin("/", NBin("-", NField("a"), NLit(BigDecimal(1))), NLit(BigDecimal(2))), "y")),
        None, None, Nil, None, None)))
    // no alias → dedicated error
    assert(parseX("SELECT a + 1") ==
      Left("arithmetic projection requires an AS alias but got: EOF at position 12"))
    // a bare field still parses exactly as before under extensions
    assert(parseX("SELECT a AS b") == parse("SELECT a AS b"))
  }

  test("extensions: unary minus binds tighter than the binary operators") {
    import NumExpr._
    assert(parseX("SELECT -a AS x") == Right(
      Statement.Select(List(Selector.Expr(NNeg(NField("a")), "x")),
        None, None, Nil, None, None)))
    assert(parseX("SELECT -a * 2 AS x") == Right(
      Statement.Select(List(Selector.Expr(
        NBin("*", NNeg(NField("a")), NLit(BigDecimal(2))), "x")),
        None, None, Nil, None, None)))
    assert(parseX("SELECT 1 - -2 AS x") == Right(
      Statement.Select(List(Selector.Expr(
        NBin("-", NLit(BigDecimal(1)), NNeg(NLit(BigDecimal(2)))), "x")),
        None, None, Nil, None, None)))
  }
}

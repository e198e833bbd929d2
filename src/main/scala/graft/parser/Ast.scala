package graft.parser

import graft.lexer.Lexer.{Binary, Funktion}

/** AST for the query dialect (reference: src/Ifrit/Parser.purs:52-121).
  *
  * GROUP BY presence flips the statement constructor: a plain SELECT is a
  * `Select` of projections; SELECT + GROUP BY is a `Group` of aggregations
  * (reference: src/Ifrit/Parser.purs:146-164).
  */
sealed trait Statement
object Statement {
  final case class Select(
      projections: List[Selector],
      from: Option[Statement],
      where: Option[Condition],
      orders: List[Order],
      limit: Option[Int],
      offset: Option[Int],
  ) extends Statement

  final case class Group(
      index: Index,
      aggregations: List[Selector],
      from: Option[Statement],
      where: Option[Condition],
      orders: List[Order],
      limit: Option[Int],
      offset: Option[Int],
  ) extends Statement

  /** EXTENSION beyond reference parity: `SELECT DISTINCT …`. The reference
    * lexes DISTINCT but never parses it (reference: src/Ifrit/Lexer.purs:129,
    * 177) and lists it as a roadmap item (reference: README.md:299-304);
    * graft implements it behind the parser's `extensions` flag so the
    * default path stays bug-compatible (DISTINCT → "unexpected token", same
    * as the reference).
    *
    * Semantics: DISTINCT deduplicates the STATEMENT'S RESULT rows — it is
    * the last stage, after the dialect's whole pipeline. Note this dialect
    * runs ORDER BY / LIMIT / OFFSET on *input* rows before the projection
    * (the reference's documented stage order), so `SELECT DISTINCT x ORDER
    * BY y LIMIT 10` means "sort inputs by y, take 10, project x, dedup" —
    * NOT ANSI's dedup-then-limit. The result's row order is unspecified
    * (dedup is a hash aggregation). Pinned by a DriverSuiteSpec test.
    */
  final case class Distinct(inner: Statement) extends Statement
}

sealed trait Selector
object Selector {
  final case class Field(name: String, alias: Option[String]) extends Selector
  final case class Fn(fn: Funktion, arg: String, alias: Option[String]) extends Selector

  /** EXTENSION (reference roadmap, README.md:299-304): `SELECT *`. Parsed
    * only when the lexer ran with `extensions = true` (the `*` token does
    * not otherwise exist). Expanded to the declared schema's fields, in
    * declaration order, at analysis time (`Semantic.expandStars`) — the
    * closed world makes the expansion static, never a runtime reflection
    * on the frame. Rejected under GROUP BY.
    */
  case object Star extends Selector

  /** EXTENSION (reference roadmap): arithmetic in projections AND
    * aggregations — `+ - * /` with standard precedence, e.g.
    * `SELECT a + 1 AS b` or `SELECT SUM(a) / SUM(b) AS r GROUP BY c`.
    * An alias is mandatory (the dialect has no expression-naming
    * convention to mirror). Atom semantics follow the statement context:
    * function atoms are the dialect's per-row ARRAY reductions (P2-P7)
    * in a plain SELECT and grouped aggregates (G3/G4) under GROUP BY;
    * bare field atoms are per-row values, valid only in a plain SELECT.
    */
  final case class Expr(expr: NumExpr, alias: String) extends Selector
}

/** Numeric expression tree for [[Selector.Expr]] (extensions only).
  * Operands are Number fields, literals, or dialect function calls; all
  * arithmetic is double (the dialect's single numeric type).
  */
sealed trait NumExpr
object NumExpr {
  final case class NLit(value: BigDecimal) extends NumExpr
  final case class NField(name: String) extends NumExpr
  final case class NFn(fn: Funktion, arg: String) extends NumExpr
  final case class NNeg(expr: NumExpr) extends NumExpr
  final case class NBin(op: String, left: NumExpr, right: NumExpr) extends NumExpr
}

/** Boolean grammar is strictly binary at each precedence level — `a AND b
  * AND c` does not parse unless parenthesized (reference:
  * src/Ifrit/Parser.purs:74-90, 266-291).
  */
sealed trait Condition
object Condition {
  final case class Term(term: graft.parser.Term) extends Condition
  final case class Or(left: graft.parser.Term, right: graft.parser.Term) extends Condition
}

sealed trait Term
object Term {
  final case class Fact(factor: Factor) extends Term
  final case class And(left: Factor, right: Factor) extends Term
}

sealed trait Factor
object Factor {
  final case class Op(operand: Operand) extends Factor
  final case class Cond(condition: Condition) extends Factor
  final case class Not(factor: Factor) extends Factor
  final case class Bin(op: Binary, left: Operand, right: Operand) extends Factor
}

sealed trait Operand
object Operand {
  final case class Str(value: String) extends Operand
  final case class Bool(value: Boolean) extends Operand
  final case class Num(value: BigDecimal) extends Operand
  final case class Field(name: String) extends Operand
  case object Null extends Operand
}

sealed trait Order { def field: String }
object Order {
  final case class Asc(field: String) extends Order
  final case class Desc(field: String) extends Order
}

sealed trait Index
object Index {
  final case class IdxField(name: String) extends Index
  case object IdxNull extends Index
}

/** Show instances used inside error messages (reference:
  * src/Ifrit/Parser.purs:471-608).
  */
object Show {
  import graft.lexer.Lexer

  def operand(o: Operand): String = o match {
    case Operand.Str(s)   => "\"" + s + "\""
    case Operand.Bool(b)  => b.toString
    case Operand.Num(n)   => Lexer.showDecimal(n)
    case Operand.Field(f) => f
    case Operand.Null     => "NULL"
  }

  def factor(f: Factor): String = f match {
    case Factor.Op(o)            => operand(o)
    case Factor.Cond(c)          => "(" + condition(c) + ")"
    case Factor.Not(x)           => "NOT(" + factor(x) + ")"
    case Factor.Bin(op, a, b)    => operand(a) + " " + op.show + " " + operand(b)
  }

  def term(t: Term): String = t match {
    case Term.Fact(f)   => factor(f)
    case Term.And(a, b) => factor(a) + " AND " + factor(b)
  }

  def condition(c: Condition): String = c match {
    case Condition.Term(t)  => term(t)
    case Condition.Or(a, b) => term(a) + " OR " + term(b)
  }
}

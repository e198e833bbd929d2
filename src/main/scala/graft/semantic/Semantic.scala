package graft.semantic

import scala.collection.immutable.VectorMap

import graft.lexer.Lexer.{Binary, Funktion, Keyword}
import graft.parser._
import graft.schema.Schema
import graft.schema.Schema._

/** Schema-gated semantic analysis + output-schema inference
  * (reference: src/Ifrit/Semantic.purs). Validates every field reference
  * against the closed-world schema and returns the schema of the statement's
  * *result*, so derived tables re-check each level against the inner level's
  * inferred output (reference: src/Ifrit/Semantic.purs:114-137).
  */
object Semantic {

  // -- error messages (reference: src/Ifrit/Semantic.purs:429-446)
  private def errUnexistingField(stage: Keyword, field: String) =
    s"unexisting field '$field' in ${stage.show} expression"
  private def errIncompatibleSchema(schema: Schema) =
    s"incompatible object schema for operation: ${schema.show}"
  private def errIncompatibleUnaryType(schema: Schema) =
    s"incompatible type ${schema.show} with unary operator NOT"
  private def errIncompatibleBinaryTypes(op: Binary, t1: Schema, t2: Schema) =
    s"incompatible types ${t1.show}, ${t2.show} with binary operator ${op.show}"
  private def errIncompatibleFnType(fn: Funktion, t: Schema) =
    s"incompatible type ${t.show} with function ${fn.show}"
  private def errInvalidFieldName(field: String) =
    s"invalid field's name '$field'"
  private def errReservedFieldName(field: String) =
    s"reserved field's name '$field'"
  // extension errors (no reference counterpart — Star/Expr never parse in
  // parity mode)
  private def errStarInGroup =
    "incompatible * projection with GROUP BY expression"
  private def errIncompatibleArith(t: Schema) =
    s"incompatible type ${t.show} in arithmetic expression"
  private def errFieldInArithAgg(field: String) =
    s"unaggregated field '$field' in arithmetic aggregation"

  /** Default output name: explicit alias, else the path with dots replaced
    * by underscores (reference: src/Ifrit/Semantic.purs:87-92).
    */
  def defaultAlias(key: String, as: Option[String]): String =
    as.getOrElse(key.replace(".", "_"))

  /** Dotted-path lookup, segment by segment
    * (reference: src/Ifrit/Semantic.purs:95-111).
    */
  def lookup(stage: Keyword, schema: Schema, key: String): Either[String, Schema] =
    schema match {
      case SObject(source) =>
        key.split("\\.", 2).toList match {
          case Nil | "" :: _ => Left(errInvalidFieldName(key))
          case h :: rest =>
            source.get(h) match {
              case Some(s) =>
                rest match {
                  case Nil      => Right(s)
                  case q :: Nil => lookup(stage, s, q)
                  case _        => Left(errInvalidFieldName(key))
                }
              case None => Left(errUnexistingField(stage, key))
            }
        }
      case other => Left(errIncompatibleSchema(other))
    }

  /** Analyze a statement against an input schema; returns the output schema
    * (reference: src/Ifrit/Semantic.purs:116-137).
    */
  def analyze(schema: Schema, stmt: Statement): Either[String, Schema] = stmt match {
    // extension: DISTINCT deduplicates rows, the output schema is the
    // inner statement's unchanged
    case Statement.Distinct(inner) => analyze(schema, inner)

    case Statement.Select(projections, from, cond, orders, _, _) =>
      for {
        schema1 <- from.fold[Either[String, Schema]](Right(schema))(analyze(schema, _))
        _ <- cond.fold[Either[String, Schema]](Right(SNull))(analyzeCondition(schema1, _))
        _ <- traverse(orders)(analyzeOrder(schema1, _))
        fields <- foldM(projections, VectorMap.empty[String, Schema])(analyzeProjection(schema1, _, _))
      } yield SObject(fields)

    case Statement.Group(index, aggregations, from, cond, orders, _, _) =>
      for {
        schema1 <- from.fold[Either[String, Schema]](Right(schema))(analyze(schema, _))
        _ <- cond.fold[Either[String, Schema]](Right(SNull))(analyzeCondition(schema1, _))
        _ <- traverse(orders)(analyzeOrder(schema1, _))
        fields <- foldM(aggregations, VectorMap.empty[String, Schema])(analyzeAggregation(schema1, _, _))
        out <- index match {
          case Index.IdxNull => Right(SObject(fields.updated("_id", SNull)))
          case Index.IdxField(key) =>
            lookup(Keyword.GroupBy, schema1, key).map(idx => SObject(fields.updated("_id", idx)))
        }
      } yield out
  }

  def analyzeOrder(schema: Schema, order: Order): Either[String, Schema] =
    lookup(Keyword.OrderBy, schema, order.field).map(_ => SNull)

  def analyzeCondition(schema: Schema, cond: Condition): Either[String, Schema] = cond match {
    case Condition.Term(t) => analyzeTerm(schema, t)
    case Condition.Or(t1, t2) =>
      for { _ <- analyzeTerm(schema, t1); _ <- analyzeTerm(schema, t2) } yield SBoolean
  }

  def analyzeTerm(schema: Schema, term: Term): Either[String, Schema] = term match {
    case Term.Fact(f) => analyzeFactor(schema, f)
    case Term.And(f1, f2) =>
      for { _ <- analyzeFactor(schema, f1); _ <- analyzeFactor(schema, f2) } yield SBoolean
  }

  def analyzeFactor(schema: Schema, factor: Factor): Either[String, Schema] = factor match {
    case Factor.Op(o)   => analyzeOperand(schema, o)
    case Factor.Cond(c) => analyzeCondition(schema, c)
    case Factor.Not(f) =>
      analyzeFactor(schema, f).flatMap {
        case SBoolean => Right(SBoolean)
        case s        => Left(errIncompatibleUnaryType(s))
      }
    case Factor.Bin(op, o1, o2) =>
      for {
        s1 <- analyzeOperand(schema, o1)
        s2 <- analyzeOperand(schema, o2)
        // Type rules (reference: src/Ifrit/Semantic.purs:188-210): Lt/Gt need
        // Number x Number; Eq/Neq need matching primitive types or a Null side.
        res <- (op, s1, s2) match {
          case (Binary.Gt, SNumber, SNumber) => Right(SBoolean)
          case (Binary.Lt, SNumber, SNumber) => Right(SBoolean)
          case (Binary.Gt, _, _)             => Left(errIncompatibleBinaryTypes(op, s1, s2))
          case (Binary.Lt, _, _)             => Left(errIncompatibleBinaryTypes(op, s1, s2))
          // extension ops (lexed only with extensions=true): same
          // Number × Number rule as Lt/Gt
          case (Binary.Gte, SNumber, SNumber) => Right(SBoolean)
          case (Binary.Lte, SNumber, SNumber) => Right(SBoolean)
          case (Binary.Gte, _, _)            => Left(errIncompatibleBinaryTypes(op, s1, s2))
          case (Binary.Lte, _, _)            => Left(errIncompatibleBinaryTypes(op, s1, s2))
          case (_, SNumber, SNumber)         => Right(SBoolean)
          case (_, SBoolean, SBoolean)       => Right(SBoolean)
          case (_, SString, SString)         => Right(SBoolean)
          case (_, _, SNull)                 => Right(SBoolean)
          case (_, SNull, _)                 => Right(SBoolean)
          case _                             => Left(errIncompatibleBinaryTypes(op, s1, s2))
        }
      } yield res
  }

  def analyzeOperand(schema: Schema, operand: Operand): Either[String, Schema] = operand match {
    case Operand.Str(_)     => Right(SString)
    case Operand.Bool(_)    => Right(SBoolean)
    case Operand.Num(_)     => Right(SNumber)
    case Operand.Null       => Right(SNull)
    case Operand.Field(key) => lookup(Keyword.Where, schema, key)
  }

  /** Projection rules (reference: src/Ifrit/Semantic.purs:232-302): plain
    * selectors pass their schema through; COUNT needs any array; AVG/MAX/
    * MIN/SUM need an array of numbers (flat path) or an array of objects
    * whose target path is a number (dotted path).
    */
  def analyzeProjection(
      schema: Schema,
      acc: VectorMap[String, Schema],
      sel: Selector,
  ): Either[String, VectorMap[String, Schema]] = sel match {
    case Selector.Field(key, as) =>
      lookup(Keyword.Select, schema, key).map(s => acc.updated(defaultAlias(key, as), s))

    // extension: * appends every declared field, in declaration order
    case Selector.Star =>
      schema match {
        case SObject(fields) =>
          Right(fields.foldLeft(acc) { case (m, (k, s)) => m.updated(k, s) })
        case other => Left(errIncompatibleSchema(other))
      }

    // extension: arithmetic over Number fields/literals/array-reductions,
    // always Number out
    case Selector.Expr(e, alias) =>
      analyzeNumExpr(schema, e, grouped = false).map(_ => acc.updated(alias, SNumber))

    case Selector.Fn(f, key, as) =>
      projectionFnType(schema, f, key).map(s => acc.updated(defaultAlias(key, as), s))
  }

  /** Type of a projection-context function call — the P2-P7 array
    * reductions: COUNT needs any array; AVG/MAX/MIN/SUM need an array of
    * numbers (flat path) or an array of objects whose target path is a
    * number (dotted path). Shared by plain Fn selectors and function
    * atoms inside extension arithmetic.
    */
  private def projectionFnType(schema: Schema, f: Funktion, key: String): Either[String, Schema] =
    f match {
      case Funktion.Count =>
        lookup(Keyword.Select, schema, key).flatMap {
          case SArray(_) => Right(SNumber)
          case s         => Left(errIncompatibleFnType(Funktion.Count, s))
        }
      case _ =>
        key.split("\\.", 2).toList match {
          case _ :: Nil =>
            lookup(Keyword.Select, schema, key).flatMap {
              case SArray(SNumber) => Right(SNumber)
              case s               => Left(errIncompatibleFnType(f, s))
            }
          case base :: rest :: Nil =>
            lookup(Keyword.Select, schema, base).flatMap {
              case SArray(elem) =>
                lookup(Keyword.Select, elem, rest).flatMap {
                  case SNumber => Right(SNumber)
                  case s       => Left(errIncompatibleFnType(f, s))
                }
              // Reference reports the *whole* schema here, not the field's
              // (reference: src/Ifrit/Semantic.purs:295-296).
              case _ => Left(errIncompatibleFnType(f, schema))
            }
          case _ => Left(errInvalidFieldName(key))
        }
    }

  /** Aggregation rules (reference: src/Ifrit/Semantic.purs:305-359): `_id`
    * is reserved; plain selectors collect into arrays; COUNT takes any
    * field and yields Number; AVG/MAX/MIN/SUM need a scalar Number field.
    * Note the reference inconsistency on grouped COUNT naming: the inferred
    * schema keys it by argument name while codegen emits `count`
    * (reference: src/Ifrit/Semantic.purs:328-333 vs Driver/MongoDB.purs:296-297);
    * both sides are kept bug-compatible here and in the planner.
    */
  def analyzeAggregation(
      schema: Schema,
      acc: VectorMap[String, Schema],
      sel: Selector,
  ): Either[String, VectorMap[String, Schema]] = sel match {
    case Selector.Field("_id", None)        => Left(errReservedFieldName("_id"))
    case Selector.Field(_, Some("_id"))     => Left(errReservedFieldName("_id"))
    case Selector.Fn(_, "_id", None)        => Left(errReservedFieldName("_id"))
    case Selector.Fn(_, _, Some("_id"))     => Left(errReservedFieldName("_id"))

    // extension: * stays per-row-only (the reference's $push collection
    // has no * form), but arithmetic IS defined under GROUP BY — atoms
    // are grouped aggregates (`SUM(a) / SUM(b)`), enforced by the
    // grouped = true context below
    case Selector.Star           => Left(errStarInGroup)
    case Selector.Expr(_, "_id") => Left(errReservedFieldName("_id"))
    case Selector.Expr(e, alias) =>
      analyzeNumExpr(schema, e, grouped = true).map(_ => acc.updated(alias, SNumber))

    case Selector.Field(key, as) =>
      lookup(Keyword.Select, schema, key).map(s => acc.updated(defaultAlias(key, as), SArray(s)))

    case Selector.Fn(Funktion.Count, key, as) =>
      lookup(Keyword.Select, schema, key).map(_ => acc.updated(defaultAlias(key, as), SNumber))

    case Selector.Fn(f, key, as) =>
      lookup(Keyword.Select, schema, key).flatMap {
        case SNumber => Right(acc.updated(defaultAlias(key, as), SNumber))
        case s       => Left(errIncompatibleFnType(f, s))
      }
  }

  /** Extension: every operand of an arithmetic expression must be Number.
    * Context decides the atom rules — in a plain SELECT (`grouped =
    * false`) fields are per-row Numbers and function calls are the P2-P7
    * array reductions; under GROUP BY (`grouped = true`) function calls
    * are the G3/G4 grouped aggregates over scalar Number fields (COUNT
    * over any field) and bare fields are rejected (no implicit
    * aggregation).
    */
  def analyzeNumExpr(schema: Schema, e: NumExpr, grouped: Boolean): Either[String, Schema] =
    e match {
      case NumExpr.NLit(_) => Right(SNumber)
      case NumExpr.NField(key) =>
        if (grouped) Left(errFieldInArithAgg(key))
        else lookup(Keyword.Select, schema, key).flatMap {
          case SNumber => Right(SNumber)
          case s       => Left(errIncompatibleArith(s))
        }
      case NumExpr.NFn(f, key) =>
        if (!grouped) projectionFnType(schema, f, key)
        else if (f == Funktion.Count)
          lookup(Keyword.Select, schema, key).map(_ => SNumber)
        else lookup(Keyword.Select, schema, key).flatMap {
          case SNumber => Right(SNumber)
          case s       => Left(errIncompatibleFnType(f, s))
        }
      case NumExpr.NNeg(inner) => analyzeNumExpr(schema, inner, grouped)
      case NumExpr.NBin(_, l, r) =>
        for {
          _ <- analyzeNumExpr(schema, l, grouped)
          _ <- analyzeNumExpr(schema, r, grouped)
        } yield SNumber
    }

  /** Extension: statically expand `SELECT *` into the declared schema's
    * fields (declaration order), recursing through derived tables with the
    * same schema flow as [[analyze]]. Runs after analysis (which already
    * validated the statement), so the planner never sees a Star. A no-op
    * for statements without one — parity-mode ASTs cannot contain it.
    */
  def expandStars(schema: Schema, stmt: Statement): Either[String, Statement] = stmt match {
    case Statement.Distinct(inner) => expandStars(schema, inner).map(Statement.Distinct(_))
    case s: Statement.Select =>
      for {
        fromX <- s.from.fold[Either[String, Option[Statement]]](Right(None))(
          f => expandStars(schema, f).map(Some(_)))
        schema1 <- s.from.fold[Either[String, Schema]](Right(schema))(analyze(schema, _))
        proj <- traverse(s.projections) {
          case Selector.Star =>
            schema1 match {
              case SObject(fields) =>
                Right(fields.toList.map { case (k, _) => Selector.Field(k, None): Selector })
              case other => Left(errIncompatibleSchema(other))
            }
          case other => Right(List(other))
        }.map(_.flatten)
      } yield s.copy(projections = proj, from = fromX)
    case g: Statement.Group =>
      // aggregations reject Star at analysis; only the FROM can hold one
      g.from.fold[Either[String, Statement]](Right(g))(
        f => expandStars(schema, f).map(x => g.copy(from = Some(x))))
  }

  private def traverse[A, B](xs: List[A])(f: A => Either[String, B]): Either[String, List[B]] =
    xs.foldRight[Either[String, List[B]]](Right(Nil)) { (a, acc) =>
      for { b <- f(a); rest <- acc } yield b :: rest
    }

  private def foldM[A, B](xs: List[A], init: B)(f: (B, A) => Either[String, B]): Either[String, B] =
    xs.foldLeft[Either[String, B]](Right(init)) { (acc, a) => acc.flatMap(f(_, a)) }
}

package graft.schema

import scala.collection.immutable.VectorMap

import org.apache.spark.sql.types._

import graft.util._

/** Closed-world schema ADT mirroring the reference data model
  * (reference: src/Ifrit/Semantic.purs:35-41): a document is an object of
  * named fields; fields are primitives, nested objects, or arrays with a
  * single element schema. Any field not declared here is unreachable from a
  * query — this is the reference's query-scoping security gate
  * (reference: README.md:206-208).
  */
sealed trait Schema {
  /** JSON encoding, identical shape to the reference encoder
    * (reference: src/Ifrit/Semantic.purs:403-422).
    */
  def toJson: JValue = this match {
    case Schema.SObject(fields) => JObject(fields.map { case (k, v) => k -> v.toJson })
    case Schema.SArray(elem)    => JArray(Vector(elem.toJson))
    case Schema.SString         => JString("string")
    case Schema.SNumber         => JString("number")
    case Schema.SBoolean        => JString("boolean")
    case Schema.SNull           => JString("null")
  }

  /** Stringified JSON — the reference's Show instance, used verbatim inside
    * semantic error messages (reference: src/Ifrit/Semantic.purs:425-426).
    */
  def show: String = toJson.render
}

object Schema {
  final case class SObject(fields: VectorMap[String, Schema]) extends Schema
  final case class SArray(elem: Schema) extends Schema
  case object SString extends Schema
  case object SNumber extends Schema
  case object SBoolean extends Schema
  case object SNull extends Schema

  def obj(fields: (String, Schema)*): Schema = SObject(VectorMap(fields: _*))

  /** Decode a schema from a JSON string (reference: src/Ifrit/Semantic.purs:58-60). */
  def fromString(json: String): Either[String, Schema] =
    Json.parse(json).flatMap(fromJson)

  /** Decode a schema from parsed JSON, with the reference's error strings
    * (reference: src/Ifrit/Semantic.purs:362-400).
    */
  def fromJson(json: JValue): Either[String, Schema] = json match {
    case JNull      => Left("can't decode null to schema")
    case JBool(_)   => Left("can't decode boolean to schema")
    case JNumber(_) => Left("can't decode number to schema")
    case JString(s) =>
      s match {
        case "string"  => Right(SString)
        case "number"  => Right(SNumber)
        case "boolean" => Right(SBoolean)
        case "null"    => Right(SNull)
        // Bug-compatible: the reference misses a space in this message
        // (reference: src/Ifrit/Semantic.purs:387-388).
        case other     => Left("unknown schema's type" + other)
      }
    case JArray(xs) =>
      if (xs.length != 1) Left("can't decode array: exactly one element is expected")
      else fromJson(xs.head).map(SArray(_))
    case JObject(fields) =>
      fields.foldLeft[Either[String, VectorMap[String, Schema]]](Right(VectorMap.empty)) {
        case (acc, (k, v)) => for { m <- acc; s <- fromJson(v) } yield m.updated(k, s)
      }.map(SObject(_))
  }

  /** Spark mapping: Number is uniformly DoubleType (the reference lexes
    * Decimal but emits doubles — reference: src/Ifrit/Driver/MongoDB.purs:452-453).
    */
  def toStructType(schema: Schema): StructType = schema match {
    case SObject(fields) =>
      StructType(fields.toSeq.map { case (k, v) => StructField(k, toDataType(v)) })
    case other =>
      throw new IllegalArgumentException(s"top-level schema must be an object, got ${other.show}")
  }

  def toDataType(schema: Schema): DataType = schema match {
    case SObject(fields) =>
      StructType(fields.toSeq.map { case (k, v) => StructField(k, toDataType(v)) })
    case SArray(elem) => ArrayType(toDataType(elem))
    case SString      => StringType
    case SNumber      => DoubleType
    case SBoolean     => BooleanType
    case SNull        => NullType
  }

  /** Derive a query schema from a Spark schema. All numeric physical types
    * (int/long/float/double/decimal) present as Number — the dialect has a
    * single numeric type. Fields whose type has no dialect equivalent
    * (timestamps, maps, binary, ...) are omitted: the closed world makes
    * them unreachable from queries rather than mistyped.
    */
  def fromStructType(st: StructType): Schema =
    SObject(VectorMap.from(st.fields.flatMap(f => fromDataType(f.dataType).map(f.name -> _))))

  private def fromDataType(dt: DataType): Option[Schema] = dt match {
    case st: StructType =>
      Some(SObject(VectorMap.from(st.fields.flatMap(f => fromDataType(f.dataType).map(f.name -> _)))))
    case ArrayType(elem, _) => fromDataType(elem).map(SArray(_))
    case StringType         => Some(SString)
    case BooleanType        => Some(SBoolean)
    case NullType           => Some(SNull)
    case _: NumericType     => Some(SNumber)
    case _                  => None
  }
}

package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Size-bounded top-k buffer ordered by (score desc, id asc): a binary
  * min-heap whose root is the *worst* retained entry, so insertion into a
  * full buffer is one compare (+ log k sift on replacement) and memory is
  * O(k) regardless of how many rows the group sees.
  */
final class TopKBuffer(val k: Int, idOrd: Ordering[Any]) {
  val scores = new Array[Double](k)
  val ids = new Array[Any](k)
  var size = 0

  /** True when (s1, id1) ranks strictly worse than (s2, id2) under
    * (score desc, id asc) — i.e. lower score, or same score & larger id.
    * Score comparison mirrors Spark's sort semantics for doubles: NaN is
    * greatest (ranks first under DESC) and -0.0 equals 0.0 (Spark
    * normalizes floating sort keys), so results match the `row_number`
    * window formulation on every input including degenerate cosines.
    */
  private def worse(s1: Double, id1: Any, s2: Double, id2: Any): Boolean = {
    val c = java.lang.Double.compare(
      if (s1 == 0.0) 0.0 else s1, // collapse -0.0; NaN falls through
      if (s2 == 0.0) 0.0 else s2)
    c < 0 || (c == 0 && idOrd.compare(id1, id2) > 0)
  }

  def insert(score: Double, id: Any): Unit = {
    if (size < k) {
      var i = size
      scores(i) = score; ids(i) = id; size += 1
      // sift up: the root holds the WORST entry, so a child bubbles up
      // only while it is worse than its parent
      while (i > 0 && worse(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    } else if (worse(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id
      // sift down
      var i = 0
      var cont = true
      while (cont) {
        val l = 2 * i + 1; val r = 2 * i + 2
        var worst = i
        if (l < size && worse(scores(l), ids(l), scores(worst), ids(worst))) worst = l
        if (r < size && worse(scores(r), ids(r), scores(worst), ids(worst))) worst = r
        if (worst == i) cont = false
        else { swap(i, worst); i = worst }
      }
    }
  }

  private def swap(a: Int, b: Int): Unit = {
    val s = scores(a); scores(a) = scores(b); scores(b) = s
    val d = ids(a); ids(a) = ids(b); ids(b) = d
  }

  /** Entries sorted best-first: (score desc, id asc). */
  def sorted: Array[(Double, Any)] =
    (0 until size).map(i => (scores(i), ids(i))).toArray
      .sortWith { case ((s1, i1), (s2, i2)) => worse(s2, i2, s1, i1) }
}

/** Bounded top-k aggregate: keeps the k best (score, id) pairs per group,
  * ordered by score descending with ties broken by id ascending, and
  * evaluates to `array<struct<id, score>>` sorted best-first.
  *
  * Why custom: ranking with `row_number() OVER (PARTITION BY group)` +
  * `filter(rank <= k)` materializes the *entire* group in one window
  * partition — for a similarity scan that is |corpus| rows per probe, a
  * scale-killer. This aggregate is partial-aggregation friendly: each map
  * task keeps an O(k) heap per group, the shuffle moves serialized k-entry
  * buffers instead of raw rows, and merges are O(k log k). Exactly the
  * bounded-memory shape `TypedImperativeAggregate` exists for.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
) extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, "topk_by_score requires k > 0")

  override def children: Seq[Expression] = Seq(score, id)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", id.dataType, nullable = false),
    StructField("score", DoubleType, nullable = false),
  )), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    val scoreOk = score.dataType == DoubleType
    val idOk = id.dataType match {
      case IntegerType | LongType | DoubleType | StringType => true
      case _ => false
    }
    if (scoreOk && idOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"topk_by_score requires (double, int|bigint|double|string), got " +
        s"(${score.dataType.simpleString}, ${id.dataType.simpleString})")
  }

  private lazy val idOrd: Ordering[Any] = id.dataType match {
    case IntegerType => Ordering.Int.on[Any](_.asInstanceOf[Int])
    case LongType    => Ordering.Long.on[Any](_.asInstanceOf[Long])
    case DoubleType  => Ordering.Double.TotalOrdering.on[Any](_.asInstanceOf[Double])
    case StringType  =>
      new Ordering[Any] {
        def compare(a: Any, b: Any): Int =
          a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String])
      }
    case other => throw new IllegalStateException(s"unsupported id type $other")
  }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k, idOrd)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      // copy buffer-backed values: a UTF8String from eval() points into
      // the reused input row buffer and would be overwritten by the next
      // row (same reason Spark's Collect aggregates copy)
      val owned = i match {
        case u: UTF8String => u.clone()
        case other         => other
      }
      buffer.insert(s.asInstanceOf[Double], owned)
    }
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.size) { buffer.insert(other.scores(i), other.ids(i)); i += 1 }
    buffer
  }

  override def eval(buffer: TopKBuffer): Any =
    new GenericArrayData(buffer.sorted.map { case (s, i) =>
      InternalRow(i, s)
    }.asInstanceOf[Array[Any]])

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    var i = 0
    while (i < buffer.size) {
      out.writeDouble(buffer.scores(i))
      id.dataType match {
        case IntegerType => out.writeInt(buffer.ids(i).asInstanceOf[Int])
        case LongType    => out.writeLong(buffer.ids(i).asInstanceOf[Long])
        case DoubleType  => out.writeDouble(buffer.ids(i).asInstanceOf[Double])
        case StringType =>
          val b = buffer.ids(i).asInstanceOf[UTF8String].getBytes
          out.writeInt(b.length); out.write(b)
        case other => throw new IllegalStateException(s"unsupported id type $other")
      }
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new TopKBuffer(k, idOrd)
    var i = 0
    while (i < n) {
      val s = in.readDouble()
      val v: Any = id.dataType match {
        case IntegerType => in.readInt()
        case LongType    => in.readLong()
        case DoubleType  => in.readDouble()
        case StringType =>
          val len = in.readInt()
          val b = new Array[Byte](len); in.readFully(b)
          UTF8String.fromBytes(b)
        case other => throw new IllegalStateException(s"unsupported id type $other")
      }
      buf.insert(s, v)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))

  override def prettyName: String = "topk_by_score"
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join shapes Spark lacks natively, built scale-first.
  */
object Joins {

  /** As-of join: for every left row, the latest right row with the same
    * key and `right.ts <= left.ts` (inclusive — a right row AT the left
    * timestamp matches, the same rule as DuckDB/kdb ASOF). Left rows with
    * no prior right row keep nulls. The event-enrichment primitive:
    * "attach the most recent sensor reading / price / click to each
    * transaction".
    *
    * Why not a join: Spark has no as-of operator, and expressing it as a
    * range join (`l.ts >= r.ts` + row_number) explodes to every
    * (left, right) pair within each key before pruning — quadratic in
    * per-key row counts. This instead UNIONs both sides tagged, sorts
    * once per key, and carries the last non-null right value forward
    * (`last(..., ignoreNulls)` over an unbounded-preceding window): ONE
    * shuffle on the key, linear work, no candidate blow-up — the same
    * plan shape at any scale. At equal timestamps right rows sort before
    * left rows, which is what makes the match inclusive.
    *
    * Precondition (same class as capPerGroup's): `right` has at most one
    * row per (key, ts) — with several, which one wins the tie is
    * partition-order-dependent. Dedupe first (e.g. keep-max by a
    * tiebreaker column); the operator cannot see a violation cheaply.
    *
    * Returns every left row + (`prefix`+valueCol, `prefix`+tsCol) from
    * the matched right row.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      prefix: String = "asof_",
  ): DataFrame = {
    val lStruct = org.apache.spark.sql.types.StructType(left.schema.fields)
    val vType = right.schema(valueCol).dataType
    val tType = right.schema(tsCol).dataType
    val lpart = left.select(
      col(keyCol).as("__k"), col(tsCol).as("__ts"), lit(1).as("__side"),
      lit(null).cast(vType).as("__rv"), lit(null).cast(tType).as("__rts"),
      struct(left.columns.map(col): _*).as("__lrow"))
    val rpart = right.select(
      col(keyCol).as("__k"), col(tsCol).as("__ts"), lit(0).as("__side"),
      col(valueCol).as("__rv"), col(tsCol).as("__rts"),
      lit(null).cast(lStruct).as("__lrow"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lpart.unionByName(rpart)
      .withColumn("__v", last(col("__rv"), ignoreNulls = true).over(w))
      .withColumn("__vts", last(col("__rts"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(c => col("__lrow." + c).as(c)) ++
        Seq(col("__v").as(prefix + valueCol), col("__vts").as(prefix + tsCol)): _*)
  }
}

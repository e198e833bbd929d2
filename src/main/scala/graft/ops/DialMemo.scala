package graft.ops

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame

/** Memo for measure-then-choose DIAL measurements (round-14 verdict ask:
  * "share/batch the measurement actions, and cache solved dials per
  * (session, rung)"). The measure-then-choose operators pay one or two
  * eager aggregation jobs at plan-construction time to learn a size
  * (winnowOverlap's candidate volume, dedupSpans' dup-hash/dup-position
  * payloads, the paragraph reassembly's changed-set payload) before
  * choosing a join strategy or enforcing a guard. Those measurements are
  * pure functions of (input plan, operator parameters): re-constructing
  * the same operator over the same input in one JVM — a bench rep, the
  * prepare/e2e chains deriving the same stage twice, an interactive
  * session iterating on a downstream step — re-paid full corpus passes to
  * re-learn a number that cannot have changed.
  *
  * What this memoizes: dial INPUTS (measured sizes) only — never query
  * results, never data, never plan fragments. A memo hit produces a plan
  * that computes every byte of the result from the parquet inputs exactly
  * as a miss does; only the construction-time measurement jobs (and the
  * scratch persists that existed solely to serve them) are skipped, and
  * the operator's strategy choice / guard verdict is reproduced from the
  * recorded size. Guards still fail loudly on a hit (same exception, same
  * message path) because the recorded volume is the same number the
  * measurement would return.
  *
  * Staleness contract — same as [[graft.SparkEntry]]'s scan memo: inputs
  * are write-once per directory for the life of the JVM. A harness that
  * regenerates test data mid-JVM must call [[clear]] (SparkEntry's
  * clearTableMemo does). Keys combine the analyzed plan's semanticHash
  * with the operator's parameter fingerprint; a (vanishingly unlikely)
  * hash collision can only swap one measured size for another, which can
  * change a broadcast-vs-merge choice or a guard verdict — never an
  * operator's output rows.
  */
private[graft] object DialMemo {
  private val memo = new ConcurrentHashMap[String, Seq[Long]]()

  /** Stable key for (measured frame, operator, params). semanticHash is
    * computed on the ANALYZED plan (no job runs) and survives alias /
    * attribute-id differences between re-constructions of the same query.
    */
  private def keyOf(df: DataFrame, tag: String, params: Seq[Any]): String = {
    val plan = df.queryExecution.analyzed
    s"$tag:${plan.semanticHash()}:${plan.schema.map(_.name).mkString(",")}:" +
      params.mkString(",")
  }

  /** The measured sizes for (df, tag, params), running `measure` exactly
    * once per distinct key per JVM. `measure` must be a deterministic,
    * side-effect-free function of the frame's contents.
    */
  def sizes(df: DataFrame, tag: String, params: Seq[Any])(
      measure: => Seq[Long]): Seq[Long] = {
    val k = keyOf(df, tag, params)
    val hit = memo.get(k)
    if (hit != null) hit
    else {
      // deliberate compute-then-put (not computeIfAbsent): `measure` runs
      // Spark jobs, and holding the map's bin lock across a job invites
      // deadlock with listener threads touching the memo
      val v = measure
      memo.putIfAbsent(k, v)
      v
    }
  }

  /** Whether the key is already solved (test hook). */
  private[graft] def solved(df: DataFrame, tag: String, params: Seq[Any]): Boolean =
    memo.containsKey(keyOf(df, tag, params))

  /** Drop every memoized dial — the regenerated-test-data escape hatch. */
  def clear(): Unit = memo.clear()

  private[graft] def size: Int = memo.size()
}

package graft.tools

/** The single source of truth for the contracted recall floors that
  * DriverSuiteSpec asserts and RecallProbe's --json artifact reports —
  * shared so the artifact can never misstate the contract it witnesses.
  * Today every contracted row carries the same 0.6 floor; a per-query
  * override goes in [[floors]] if a row's contract ever diverges.
  */
object RecallContract {
  val DefaultFloor = 0.6
  val floors: Map[String, Double] = Map.empty
  def floor(query: String): Double = floors.getOrElse(query, DefaultFloor)

  /** JSON-safe rendering: a NaN/Inf recall (possible when a probe set
    * comes back empty) must not emit invalid JSON.
    */
  def jsonNum(x: Double): String =
    if (java.lang.Double.isFinite(x)) x.toString else "null"
}

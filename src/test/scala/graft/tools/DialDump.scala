package graft.tools

/** Print the scale-solved dedup/near-dup dials for a corpus size (round-14
  * ask #6: "with the banding dials' solved values logged"). Pure driver
  * math — no Spark jobs.
  *
  *   Test/runMain graft.tools.DialDump <nDocs> <nVectors>
  */
object DialDump {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(5000000L)
    val nVecs = if (args.length > 1) args(1).toLong else 2000000L
    println(s"DIALS n_docs=$nDocs n_vectors=$nVecs")
    println(s"  minhash: numHashes=128 bands=32 (threshold-matched, fixed: " +
      "s* ~= 0.42 for the 0.5 cut - dial is threshold-shaped, not corpus-shaped)")
    for (r <- Seq(3, 8))
      println(s"  simHashKeyBlocksFor(n=$nDocs, maxHamming=$r) = " +
        graft.ops.Dedup.simHashKeyBlocksFor(nDocs, r))
    // SparkEntry.srpConfigFor's formula, replicated (it is private and
    // session-bound; the math is a pure function of the vector count)
    val (planes, tables) =
      if (nVecs <= 2000L) (5, 12)
      else {
        val p = 5 + (math.log(nVecs / 2000.0) / math.log(2.0)).floor.toInt
        val pTable = math.pow(1.0 - math.acos(0.45) / math.Pi, p)
        (p, math.ceil(math.log(0.25) / math.log(1.0 - pTable)).toInt)
      }
    println(s"  srpConfigFor(n=$nVecs) = planes $planes tables $tables")
    println(s"  simhashSlicesFor(n=$nDocs) = " +
      (if (nDocs <= 5000L) 1 else math.ceil(math.sqrt(nDocs / 5000.0)).toInt) +
      " (radius-8 slice dial, SparkEntry formula)")
    println(s"  winnowConfigFor(n=$nDocs) = " +
      graft.ops.TextOps.winnowConfigFor(nDocs))
  }
}

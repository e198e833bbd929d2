package graft.ops

import org.apache.spark.sql.DataFrame

/** The one-call training-data preparation chain: curation gates → exact
  * keep-first dedup → benchmark decontamination (exact n-gram, optionally
  * followed by fuzzy whole-document near-dup) → deterministic
  * train/val/test split. Each stage is the already-oracled standalone
  * operator ([[Curate.curate]], [[TextOps.decontaminate]],
  * [[Dedup.fuzzyDecontaminate]], [[Sample.splitByHash]]), composed in the
  * order a production corpus build runs them — gates first (narrow,
  * scan-speed, drops most rows before anything wide), dedup and
  * decontamination over the survivors only, the split last as a free
  * narrow projection.
  *
  * The composition itself is also oracle-checked end to end
  * (`q_pipeline_prepare` / `q_pipeline_prepare_fuzzy`): the full chain —
  * gates, QUALIFY keep-first, NOT-IN decontamination (and the fuzzy
  * Jaccard NOT-IN when enabled), CASE split — recomputed as one DuckDB
  * query.
  */
object Pipeline {

  /** `fuzzyThreshold = Some(t)` runs the standard hygiene stack's SECOND
    * decontamination pass — [[Dedup.fuzzyDecontaminate]] at whole-document
    * shingle-Jaccard `t` — over the exact pass's survivors, catching
    * benchmark text that reached the crawl lightly edited. `None` (the
    * default) keeps the exact-only chain.
    *
    * `extraGate = Some(col)` folds an additional caller-supplied boolean
    * gate into the narrow filter stage — the hook for the rule batteries
    * ([[TextOps.gopherPass]], a `c4Clean`-emptiness test, a trained
    * [[Embeddings.linearScore]] threshold) without widening this
    * signature per rule. It runs with the other gates, before anything
    * wide; rows where the gate is null are dropped (a gate that can't
    * decide doesn't pass).
    */
  def prepare(
      docs: DataFrame,
      bench: DataFrame,
      textCol: String,
      idCol: String,
      splits: Seq[(String, Double)],
      salt: String = "",
      lang: String = "en",
      minQuality: Double = 0.6,
      maxDup3: Double = 0.05,
      n: Int = 5,
      minOverlap: Int = 1,
      fuzzyThreshold: Option[Double] = None,
      fuzzyNumHashes: Int = 128,
      fuzzyBands: Int = 32,
      extraGate: Option[org.apache.spark.sql.Column] = None,
  ): DataFrame = {
    val gated = extraGate.fold(docs)(g => docs.filter(g))
    // NOT persisted (measured, r14): the curated frame is consumed twice
    // inside the decontamination plan, but both consumers read the SAME
    // keep-first window exchange, which ReuseExchange deduplicates at
    // runtime — the gate battery already runs once. An intra-query
    // persist here measured ~1.2 s SLOWER at sf0.1 (cache write + lost
    // pipelining, nothing saved). The e2e flagship is different: its
    // stages run EAGER internal jobs whose separate plans cannot share
    // exchanges — persists pay there (see SparkEntry.q_pipeline_e2e).
    val exact = TextOps.decontaminate(
      Curate.curate(gated, textCol, idCol, lang, minQuality, maxDup3),
      bench, textCol, idCol, n, minOverlap)
    val cleaned = fuzzyThreshold.fold(exact)(t =>
      Dedup.fuzzyDecontaminate(exact, bench, textCol, idCol,
        numHashes = fuzzyNumHashes, bands = fuzzyBands, shingleSize = n,
        threshold = t))
    Sample.splitByHash(cleaned, idCol, splits, salt)
  }
}

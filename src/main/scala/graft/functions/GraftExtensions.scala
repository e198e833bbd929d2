package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions injector: makes graft's native expressions
  * available to any session — including plain `spark.sql("... vec_dot(a,
  * b) ...")` — via the standard mechanism:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)                       // in code
  * // or: --conf spark.sql.extensions=graft.functions.GraftExtensions
  * }}}
  *
  * `GraftFunctions.register(spark)` remains the per-session alternative the
  * operators use internally.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions", null, name, usage, "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two float/double arrays (double)"),
      (exprs: Seq[Expression]) => FloatVecDot(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(hashes, n) - n seeded min-hashes of an array<bigint>"),
      (exprs: Seq[Expression]) =>
        ArrayMinHash(exprs(0), exprs(1).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(text, k) - lowercase word k-gram shingles"),
      (exprs: Seq[Expression]) =>
        WordShingles(exprs(0), exprs(1).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((
      FunctionIdentifier("simhash60"),
      info("simhash60", "simhash60(text) - 60-bit md5-derived SimHash of the token stream"),
      (exprs: Seq[Expression]) => SimHash60(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("simhash120"),
      info("simhash120", "simhash120(text) - 120-bit two-lane md5-derived SimHash as array<bigint>[2]; element 0 = simhash60"),
      (exprs: Seq[Expression]) => SimHash120(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("array_sum"),
      info("array_sum", "array_sum(arr) - sum of a numeric array, accumulated in double"),
      (exprs: Seq[Expression]) => ArraySum(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("deflate_len"),
      info("deflate_len", "deflate_len(text) - DEFLATE-compressed byte length of the UTF-8 text"),
      (exprs: Seq[Expression]) => DeflateLen(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("contains_any"),
      info("contains_any", "contains_any(text, patterns) - Aho-Corasick any-substring match against a literal array<string>"),
      (exprs: Seq[Expression]) => ContainsAny(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize", "nfc_normalize(text) - Unicode NFC canonical composition (run before digest-keyed dedup on non-ASCII corpora)"),
      (exprs: Seq[Expression]) => NfcNormalize(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("topk_by_score"),
      info("topk_by_score", "topk_by_score(score, id, k) - bounded top-k by (score desc, id asc) as array<struct<id, score>>"),
      (exprs: Seq[Expression]) =>
        TopKByScore(exprs(0), exprs(1), exprs(2).eval().asInstanceOf[Number].intValue())))
  }
}

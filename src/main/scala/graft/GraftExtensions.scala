package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension injector: makes the engine's codegen expressions
  * first-class SQL functions in ANY session configured with
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * — the library-distribution path for custom Catalyst expressions
  * (SURVEY.md §2.3 note on custom operators): a pure-SQL user gets
  * `vec_dot` / `minhash_sig` / `shingle_hashes` without touching the
  * Scala API, and the functions resolve in every session of the cluster,
  * not just ones that called `register()`. The `register()` helpers on
  * the function objects remain for per-session programmatic use — both
  * paths build the identical codegen'd expression trees.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - double dot product of two array<float> columns"),
      (exprs: Seq[Expression]) => graft.functions.FloatVecDot(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(hashes) - 128-permutation MinHash signature of array<bigint>"),
      (exprs: Seq[Expression]) => graft.functions.MinHashSig(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("shingle_hashes"),
      info("shingle_hashes", "shingle_hashes(text, n) - distinct hashed char n-gram shingles"),
      (exprs: Seq[Expression]) => graft.functions.ShingleHashes.build(exprs)))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(hashes) - 64-bit SimHash of array<bigint> token hashes"),
      (exprs: Seq[Expression]) => graft.functions.SimHash64(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("winnow_fingerprints"),
      info("winnow_fingerprints",
        "winnow_fingerprints(text, k, w) - distinct winnowing (MOSS) fingerprint md5 hexes"),
      graft.functions.WinnowFingerprints.builder))
  }
}

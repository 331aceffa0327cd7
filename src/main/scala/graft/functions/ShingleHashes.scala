package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: hashed character n-gram shingles of
  * lower(text), computed IN PLACE over the UTF-8 bytes.
  *
  * Declarative equivalent (what this replaces in the MinHash signature
  * path): `transform(charShingles(text, n), sh -> pmod(xxhash64(sh), P))`
  * — which materializes every shingle as a copied UTF8String and walks an
  * interpreted HOF per element. Here: lowercase once, record character
  * start offsets, and XXH64 each n-char window's byte range directly off
  * the string's buffer — one pass, zero per-shingle allocation.
  *
  * Two deliberate semantic properties:
  *  - hashes equal `pmod(xxhash64(substr), P)` BIT-EXACTLY (same XXH64
  *    seed 42 over the same byte ranges, same Mersenne-prime fold), so
  *    MinHash signatures built from either path are identical —
  *    asserted in MinHashParitySpec;
  *  - duplicates are NOT removed: MinHash's per-permutation min is
  *    invariant to multiplicity, so the distinct pass the string path
  *    needs (for exact-Jaccard verification) is pure waste here.
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  override def prettyName: String = "shingle_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_hashes expects string, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($s, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {
  private val Seed = 42L // xxhash64's default seed in Spark
  private val P = MinHashFunctions.P

  /** Static kernel so generated code is a single call. */
  def compute(raw: UTF8String, n: Int): ArrayData = {
    val s = raw.toLowerCase // what lower() evaluates
    val numBytes = s.numBytes()
    // character start offsets (UTF-8 boundaries); starts(i) = byte offset
    // of the i-th character, starts(nChars) = numBytes
    val starts = new Array[Int](numBytes + 1)
    var nChars = 0
    var off = 0
    while (off < numBytes) {
      starts(nChars) = off
      off += UTF8String.numBytesForFirstByte(s.getByte(off))
      nChars += 1
    }
    starts(nChars) = numBytes
    if (nChars < n) return new GenericArrayData(Array.emptyLongArray)
    val base = s.getBaseObject
    val baseOff = s.getBaseOffset
    val out = new Array[Long](nChars - n + 1)
    var i = 0
    while (i <= nChars - n) {
      val b0 = starts(i)
      val h = XXH64.hashUnsafeBytes(base, baseOff + b0, starts(i + n) - b0, Seed)
      out(i) = ((h % P) + P) % P // pmod into [0, P)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Builder shared by register() and GraftExtensions: validates arity
    * and that `n` is a foldable integer literal BEFORE eval — a
    * non-foldable or mistyped arg gets a clear error instead of an
    * opaque ClassCastException/NPE from `eval(null).asInstanceOf[Int]`
    * (SQL integer literals ≥ 2^31 arrive as Long; CAST(12 AS BIGINT) is
    * legitimate and must work). */
  def build(exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): ShingleHashes = {
    require(exprs.length == 2,
      s"shingle_hashes(text, n) takes exactly 2 arguments, got ${exprs.length}")
    val nExpr = exprs(1)
    require(nExpr.foldable, "shingle_hashes(text, n): n must be a constant integer")
    val n = nExpr.eval(null) match {
      case i: Int => i
      case l: Long if l.isValidInt => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new IllegalArgumentException(
        s"shingle_hashes(text, n): n must be an integer literal, got $other")
    }
    require(n > 0, s"shingle_hashes(text, n): n must be positive, got $n")
    ShingleHashes(exprs.head, n)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle_hashes", build, "built-in")

  /** Column API (register first): hashed n-gram shingles of a string. */
  def shingleHashes(text: Column, n: Int): Column =
    call_udf("shingle_hashes", text, lit(n))
}

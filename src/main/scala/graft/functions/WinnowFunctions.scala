package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing a document's winnowing (MOSS)
  * fingerprint set — distinct sliding-window minima of per-k-gram md5
  * hex digests — in ONE pass over the text.
  *
  * The declarative formulation materializes an n-element array of md5
  * hex STRINGS per row (one `substr` + binary cast + md5 allocation per
  * character position), then re-slices it w times per window position
  * through interpreted HOF lambdas — the second most expensive per-row
  * stage of the round-2 bench (3.0 s at sf0.1 for ~10M md5 calls).
  * This expression digests each k-gram once into a reused buffer,
  * keeps the window minimum with an O(n·w) byte-compare over hex
  * digests (w = 4: cheaper than a deque for real window sizes), and
  * emits first-occurrence-ordered distinct minima.
  *
  * Contract (bit-identical to the declarative version — parity asserted
  * in WinnowParitySpec):
  *   hex[i]  = md5(utf8(substr(text, i+1, k)))   (SQL char positions)
  *   fp[j]   = min over hex[j .. j+w-1]          (binary string order)
  *   result  = array_distinct(fp), empty when numChars < k + w − 1.
  * The caller lowercases the text, exactly as before.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def prettyName: String = "winnow_fingerprints"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow_fingerprints expects string, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.WinnowFingerprints.compute($t, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprints {
  private val HexDigits = "0123456789abcdef".getBytes

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(t: UTF8String, k: Int, w: Int): ArrayData = {
    val len = t.numChars()
    if (len < k + w - 1) return new GenericArrayData(Array.empty[Any])
    val n = len - k + 1
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      // substringSQL is the exact kernel behind Column.substr (1-based
      // char positions, UTF-8 aware) — parity with the declarative path
      md.reset()
      val digest = md.digest(t.substringSQL(i + 1, k).getBytes)
      val hx = new Array[Byte](32)
      var b = 0
      while (b < 16) {
        hx(2 * b) = HexDigits((digest(b) >> 4) & 0xf)
        hx(2 * b + 1) = HexDigits(digest(b) & 0xf)
        b += 1
      }
      hex(i) = hx
      i += 1
    }
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var j = 0
    while (j <= n - w) {
      var min = hex(j)
      var x = j + 1
      while (x < j + w) {
        if (compareBytes(hex(x), min) < 0) min = hex(x)
        x += 1
      }
      seen.add(UTF8String.fromBytes(min))
      j += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  private def compareBytes(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < 32) {
      if (a(i) != b(i)) return (a(i) & 0xff) - (b(i) & 0xff)
      i += 1
    }
    0
  }

  /** Builder shared by register() and GraftExtensions: k and w must be
    * constant integers (validated like ShingleHashes.build). */
  val builder: Seq[Expression] => WinnowFingerprints = exprs => {
    require(exprs.length == 3,
      s"winnow_fingerprints(text, k, w) takes 3 arguments, got ${exprs.length}")
    WinnowFingerprints(exprs.head, constInt(exprs(1), "k"), constInt(exprs(2), "w"))
  }

  /** Register `winnow_fingerprints` (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnow_fingerprints", builder, "built-in")

  private def constInt(e: Expression, name: String): Int = {
    require(e.foldable, s"winnow_fingerprints: $name must be a constant integer")
    e.eval(null) match {
      case i: Int => i
      case l: Long if l.isValidInt => l.toInt
      case other => throw new IllegalArgumentException(
        s"winnow_fingerprints: $name must be an integer literal, got $other")
    }
  }

  /** Column API (register first). */
  def winnowFingerprints(text: Column, k: Int, w: Int): Column =
    call_udf("winnow_fingerprints", text, lit(k), lit(w))
}

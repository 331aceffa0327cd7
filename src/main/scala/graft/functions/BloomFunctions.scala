package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst predicate for Bloom-filter semi-join reduction
  * (SURVEY.md §2.3 D — the dim-too-big-to-broadcast join regime).
  *
  * The classic distributed-DB move: when the dimension side of a join is
  * too large to broadcast as a hash table but its KEY SET still fits a
  * fixed-size bitmap, build a Bloom filter over the dim keys, broadcast
  * the ~1 MB bitmap, and filter the fact side BEFORE its shuffle — the
  * exchange then moves only rows that can possibly match (plus the
  * bounded false-positive mass), and the exact join afterwards removes
  * the false positives, so the reduction is semantically invisible.
  * Spark's own runtime row-level filtering does this opportunistically;
  * this expression makes it an explicit, testable operator.
  *
  * The expression holds the [[Broadcast]] handle, NOT the bitmap: the
  * serialized plan ships a few bytes per task and each executor fetches
  * the bitmap once — the 100 TB-correct shape (a bitmap literal would
  * re-ship ~1 MB with every task binary). `mightContainLong` is a couple
  * of hash probes; the codegen path keeps it inside whole-stage codegen
  * so the fact scan + bloom filter + shuffle write stay one fused stage.
  */
case class BloomMightContain(child: Expression, bf: Broadcast[BloomFilter])
    extends UnaryExpression {
  override def prettyName: String = "bloom_might_contain"
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects a bigint key, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    bf.value.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBc", bf,
      classOf[Broadcast[_]].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ((org.apache.spark.util.sketch.BloomFilter) $ref.value()).mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomFunctions {
  /** Predicate column testing `key` against the broadcast Bloom filter.
    * Registered as a temp function (the [[VectorFunctions.register]]
    * pattern) so the analyzer resolves it; the builder closes over the
    * broadcast handle. Queries run sequentially per session, so the
    * re-registration per call site is race-free. */
  def mightContain(s: SparkSession, bf: Broadcast[BloomFilter], key: Column): Column = {
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_might_contain", exprs => BloomMightContain(exprs(0), bf), "built-in")
    call_udf("bloom_might_contain", key)
  }
}

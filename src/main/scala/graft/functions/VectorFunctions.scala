package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for float-vector dot products (SURVEY.md
  * §2.3 J similarity search). A codegen'd tight loop over the two
  * `ArrayData` buffers — no per-element boxing, no higher-order-function
  * lambda dispatch, stays inside whole-stage codegen. On a 25M-pair
  * similarity join this is the hot path; the HOF equivalent
  * (`aggregate(zip_with(...))`) allocates an intermediate array per row
  * and falls out of codegen.
  *
  * Math contract (oracle parity): accumulate left-to-right in double with
  * each float widened first — bitwise identical to DuckDB's
  * `list_dot_product(CAST(a AS DOUBLE[]), CAST(b AS DOUBLE[]))` (verified
  * empirically: DuckDB uses the same naive loop).
  */
case class FloatVecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "vec_dot"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects two array<float> args, got ${left.dataType}, ${right.dataType}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
        int $n = $a.numElements() < $b.numElements() ? $a.numElements() : $b.numElements();
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Register `vec_dot` in the session's function registry (idempotent) so
    * it is usable from both `expr(...)` and `spark.sql(...)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => FloatVecDot(exprs(0), exprs(1)), "built-in")

  /** Column API over the registered function (register first). */
  def vecDot(a: Column, b: Column): Column = call_udf("vec_dot", a, b)

  /** Cosine similarity with DuckDB `list_cosine_similarity` bit-parity:
    * dot / (sqrt(norm_a) * sqrt(norm_b)), all double. */
  def cosine(a: Column, b: Column): Column =
    vecDot(a, b) / (sqrt(vecDot(a, a)) * sqrt(vecDot(b, b)))
}

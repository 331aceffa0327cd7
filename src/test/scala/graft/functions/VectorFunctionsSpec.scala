package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorFunctionsSpec extends SparkSpec {
  test("vec_dot matches a reference loop, in both codegen and interpreted eval") {
    import spark.implicits._
    VectorFunctions.register(spark)
    val a = Array(0.5f, -1.25f, 3f, 0.1f)
    val b = Array(2f, 0.5f, -1f, 10f)
    val expected = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
    val df = Seq((a, b)).toDF("a", "b")
    val got = df.select(VectorFunctions.vecDot($"a", $"b")).head.getDouble(0)
    assert(got == expected)
    // interpreted path (nullSafeEval)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val interp = FloatVecDot(
      Literal.create(a, ArrayType(FloatType)),
      Literal.create(b, ArrayType(FloatType))).eval(null)
    assert(interp == expected)
  }

  test("cosine of identical vectors is 1.0, orthogonal is 0.0") {
    import spark.implicits._
    VectorFunctions.register(spark)
    val df = Seq(
      (Array(1f, 2f, 3f), Array(1f, 2f, 3f)),
      (Array(1f, 0f, 0f), Array(0f, 1f, 0f))).toDF("a", "b")
    val rows = df.select(VectorFunctions.cosine($"a", $"b")).collect().map(_.getDouble(0))
    assert(math.abs(rows(0) - 1.0) < 1e-12)
    assert(rows(1) == 0.0)
  }

  test("null input → null output") {
    VectorFunctions.register(spark)
    val row = spark.sql("SELECT vec_dot(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT)))").head
    assert(row.isNullAt(0))
  }

  test("usable from SQL after registration") {
    VectorFunctions.register(spark)
    val v = spark.sql(
      "SELECT vec_dot(array(CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT)))").head.getDouble(0)
    assert(v == 6.0)
  }
}

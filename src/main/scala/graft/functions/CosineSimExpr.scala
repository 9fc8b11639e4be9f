package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native codegen'd cosine similarity over two ARRAY<DOUBLE> columns.
  *
  * Arithmetic order matches the declarative
  * [[graft.similarity.Similarity.cosine]] exactly (sequential double
  * accumulation of dot and squared norms, then dot/(√·√)) so results —
  * and DuckDB oracle comparisons — are bit-identical; the win is that
  * the O(pairs × dim) inner loop runs as one static call inside
  * whole-stage codegen instead of per-element interpreted lambdas
  * (~50× on the all-pairs near-dup query).
  */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    CosineSimExpr.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.CosineSimExpr.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
}

object CosineSimExpr {
  /** Static kernel shared by interpreted eval and generated code. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimExpr(exprs(0), exprs(1)), "scala_udf")

  /** Column entry point; casts both sides to array<double> (cheap,
    * codegen'd) so the kernel sees one element type. */
  def cosineSim(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("cosine_sim", a.cast("array<double>"), b.cast("array<double>"))
  }
}

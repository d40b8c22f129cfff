package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the vector dot product — the hot kernel of
  * every cosine-similarity operator in graft.pipeline.Similarity.
  *
  * Preference order per the build brief: built-in composition
  * (`aggregate(zip_with(...))`) works but runs interpreted lambda steps per
  * element; this expression is whole-stage-codegen'd into a tight primitive
  * loop (no per-element allocation), ~an order of magnitude faster on 64-dim
  * arrays, while computing the IDENTICAL left-to-right IEEE sum — so results
  * stay bit-for-bit equal to the higher-order-function form and to the
  * DuckDB oracle.
  *
  * Array elements must be non-null doubles (embedding vectors).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must be array<double> (AbstractDataType is private[sql], so no
  // ExpectsInputTypes here; graft call sites always cast to double arrays)
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

object VectorExpressions {

  /** Idempotently register graft's native expressions on a session, making
    * them available to `selectExpr`/`spark.sql` as ordinary functions.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
}

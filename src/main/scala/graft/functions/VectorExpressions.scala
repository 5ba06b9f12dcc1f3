package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the vector hot path.
  *
  * The composable form (`zip_with` + `aggregate`) is semantically right
  * but its lambdas are interpreted per element — for a 64-dim dot
  * product over millions of candidate pairs that is the dominant cost.
  * This expression generates a tight Java loop inside whole-stage
  * codegen instead, with the SAME sequential left-to-right double
  * accumulation as the fold (and as DuckDB's list_reduce), so results
  * stay bit-identical to the oracle.
  *
  * Assumes equal-length, non-null-element double arrays (the engine's
  * embedding contract); extra elements on either side are ignored.
  * `ImplicitCastInputTypes` (same mixin upstream arithmetic uses) lets
  * the analyzer insert casts for castable inputs — array<float>
  * embeddings arrive as array<double> rather than failing analysis.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes: Seq[Bridge.AbstractType] =
    Seq(org.apache.spark.sql.types.ArrayType(DoubleType), org.apache.spark.sql.types.ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i   = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native 60-bit md5 content hash (see Hashing.hash60): identical
  * value to `conv(substring(md5(c),1,15),16,10)` — proven by spec
  * against the column form and the DuckDB oracle — but computed as
  * digest → first-8-bytes fold, skipping the hex-string render,
  * substring alloc, and base-16 re-parse that the composed form pays
  * per row. In the dedup pipelines this runs per (shingle × hash-family
  * member): the hottest scalar in the engine.
  */
case class Hash60Expr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes: Seq[Bridge.AbstractType] =
    Seq(org.apache.spark.sql.types.StringType)
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "hash60"

  override def nullSafeEval(v: Any): Any =
    MinHashAgg.hash60Bytes(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashAgg.hash60Bytes($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExpressions {

  /** Codegen'd sequential dot product of two array<double> columns. */
  def dotProduct(a: Column, b: Column): Column =
    Bridge.column(DotProductExpr(Bridge.expression(a), Bridge.expression(b)))

  /** Codegen'd 60-bit md5 hash of a string column. */
  def hash60(c: Column): Column =
    Bridge.column(Hash60Expr(Bridge.expression(c)))
}

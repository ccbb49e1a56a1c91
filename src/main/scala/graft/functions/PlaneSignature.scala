package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native sign-LSH signature: bit b of the result is set iff
  * dot(vector, plane_b) > 0, for a fixed hyperplane matrix baked into
  * the expression (row-major `planes`, `nPlanes` rows of `dim` each).
  *
  * Replaces the per-plane `aggregate(zip_with(...))` HOF formulation,
  * whose 12 folds — each against a 64-element literal array — built an
  * expression tree that cost whole seconds of cold codegen (round-1
  * bench finding). Here the whole signature is ONE expression node with
  * one fused loop; numerics are identical (sequential IEEE double
  * multiply-add per plane, float widened to double).
  */
case class PlaneSignature(
    child: Expression,
    planes: Array[Double],
    nPlanes: Int)
  extends UnaryExpression {

  private val dim: Int = if (nPlanes == 0) 0 else planes.length / nPlanes

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT>, got ${other.sql}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "plane_signature"

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), dim)
    var sig = 0
    var b = 0
    while (b < nPlanes) {
      var dot = 0.0
      val off = b * dim
      var i = 0
      while (i < n) { dot += x.getFloat(i).toDouble * planes(off + i); i += 1 }
      if (dot > 0) sig |= 1 << b
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n"); val sig = ctx.freshName("sig")
      val b = ctx.freshName("b"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val off = ctx.freshName("off")
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $dim);
         |int $sig = 0;
         |for (int $b = 0; $b < $nPlanes; $b++) {
         |  double $dot = 0.0;
         |  int $off = $b * $dim;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += (double) $v.getFloat($i) * $planesRef[$off + $i];
         |  }
         |  if ($dot > 0) $sig |= 1 << $b;
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PlaneSignature {
  /** Register `plane_signature(vec)` with the given hyperplane matrix
    * captured in the builder closure (the registry path is how a
    * parameterized catalyst Expression reaches the Column API). */
  def register(spark: SparkSession, planes: Array[Array[Double]]): Unit = {
    val flat = planes.flatten
    val n = planes.length
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "plane_signature", exprs => PlaneSignature(exprs.head, flat, n), "built-in")
  }
}

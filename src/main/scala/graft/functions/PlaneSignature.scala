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
  *
  * Degenerate inputs follow the HOF semantics exactly: zip_with against
  * a `dim`-element literal null-pads a short (or truncates a long)
  * vector and propagates null elements, making every plane's dot NULL →
  * `> 0` false → bit 0. So any vector whose length ≠ dim, or containing
  * a null element, signs to 0 — all bits clear — here too.
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
    if (x.numElements() != dim) return 0
    var i = 0
    while (i < dim) { if (x.isNullAt(i)) return 0; i += 1 }
    var sig = 0
    var b = 0
    while (b < nPlanes) {
      var dot = 0.0
      val off = b * dim
      var j = 0
      while (j < dim) { dot += x.getFloat(j).toDouble * planes(off + j); j += 1 }
      if (dot > 0) sig |= 1 << b
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val sig = ctx.freshName("sig")
      val b = ctx.freshName("b"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val off = ctx.freshName("off")
      val ok = ctx.freshName("ok")
      s"""
         |int $sig = 0;
         |boolean $ok = $v.numElements() == $dim;
         |for (int $i = 0; $ok && $i < $dim; $i++) {
         |  if ($v.isNullAt($i)) $ok = false;
         |}
         |if ($ok) {
         |  for (int $b = 0; $b < $nPlanes; $b++) {
         |    double $dot = 0.0;
         |    int $off = $b * $dim;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      $dot += (double) $v.getFloat($i) * $planesRef[$off + $i];
         |    }
         |    if ($dot > 0) $sig |= 1 << $b;
         |  }
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

package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: the dot products of one embedding against
  * EVERY row of a ±1 sign matrix (array<array<double>> literal), as one
  * array<double> — the per-row work of VectorOps.lshTables. Each plane's
  * product is the same strict left fold as [[DotProduct]], so bucket sign
  * bits are bit-identical to the declarative formulation (OpsSpec's
  * lshTables-vs-lshBucketAt equivalence test pins it).
  *
  * Why a custom Expression: the outer `transform(sequence(0,total-1), …)`
  * HOF is CodegenFallback — evaluated interpreted per PLANE per row even
  * with a native inner fold (measured ~3 s of the d10 bench for 1,500
  * rows × 64 planes). One static call per row runs the whole
  * planes × dims loop unboxed and JIT-compiled.
  */
case class SignDots(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = SignDots.functionName

  override protected def nullSafeEval(e: Any, s: Any): Any =
    SignDots.compute(e.asInstanceOf[ArrayData], s.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (e, s) => s"graft.functions.SignDots.compute($e, $s)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SignDots =
    copy(left = newLeft, right = newRight)
}

object SignDots {

  /** Per sign-matrix row p: strict left-fold Σ_d emb[d] · signs[p][d]. */
  def compute(emb: ArrayData, signs: ArrayData): GenericArrayData = {
    val total = signs.numElements()
    val out = new Array[Double](total)
    val n = emb.numElements()
    var p = 0
    while (p < total) {
      val row = signs.getArray(p)
      var acc = 0.0
      var d = 0
      while (d < n) {
        acc += emb.getDouble(d) * row.getDouble(d)
        d += 1
      }
      out(p) = acc
      p += 1
    }
    new GenericArrayData(out)
  }

  val functionName = "graft_sign_dots"

  private val registered =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Boolean]())

  /** Register in a session's function registry (idempotent per session). */
  def ensureRegistered(spark: SparkSession): Unit =
    if (registered.add(System.identityHashCode(spark))) {
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(functionName),
        new ExpressionInfo(classOf[SignDots].getName, functionName),
        (exprs: Seq[Expression]) => SignDots(exprs(0), exprs(1)))
    }
}

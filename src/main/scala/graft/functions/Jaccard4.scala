package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression: token-set Jaccard similarity of two SORTED
  * DISTINCT string arrays, rounded to 4 decimals exactly like Spark's
  * `round(x, 4)` (scala BigDecimal.decimal → java BigDecimal.valueOf,
  * HALF_UP — the OpsSpec equivalence test pins bit-equality against the
  * builtin formulation).
  *
  * Why a custom Expression: the builtin formulation
  * `round(size(array_intersect(a,b)) / (size(a)+size(b)-size(array_intersect(a,b))), 4)`
  * is (a) pushed by the optimizer into the verify join's CONDITION, where
  * common-subexpression elimination does not apply — `array_intersect` ran
  * TWICE per candidate pair (10^7 pairs on the d7 bench), each building a
  * per-row hash set of UTF8 strings; and (b) a large expression tree that
  * bloats the fused join stage's generated method. One static call does a
  * single allocation-free sorted-merge intersection per pair and keeps the
  * join loop JIT-compiled. Inputs MUST be sorted ascending and distinct
  * (callers use `sort_array(array_distinct(...))`; sort_array's StringType
  * ordering is UTF8String.compareTo, the comparison used here).
  */
case class Jaccard4(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = DoubleType
  override def prettyName: String = Jaccard4.functionName

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Jaccard4.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Jaccard4.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Jaccard4 =
    copy(left = newLeft, right = newRight)
}

object Jaccard4 {

  /** |A∩B| / |A∪B| over sorted distinct string arrays, rounded like
    * Spark's round(x, 4) (BigDecimal.valueOf + HALF_UP).
    */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    val union = na + nb - inter
    val jac = inter.toDouble / union
    java.math.BigDecimal.valueOf(jac)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  val functionName = "graft_jaccard4"

  private val registered =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Boolean]())

  /** Register in a session's function registry (idempotent per session). */
  def ensureRegistered(spark: SparkSession): Unit =
    if (registered.add(System.identityHashCode(spark))) {
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(functionName),
        new ExpressionInfo(classOf[Jaccard4].getName, functionName),
        (exprs: Seq[Expression]) => Jaccard4(exprs(0), exprs(1)))
    }
}

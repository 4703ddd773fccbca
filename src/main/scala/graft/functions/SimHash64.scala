package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: 64-bit SimHash of the whitespace-token SET of
  * a string — per-bit majority vote over xxhash64(token) (seed 42, identical
  * to Spark's `xxhash64` builtin, so it is bit-for-bit equal to the
  * declarative higher-order-function formulation in TextOps.withSimhash).
  *
  * Why a custom Expression: the HOF formulation builds a 64-element
  * `transform × aggregate` expression tree evaluated per row — correct but
  * interpretation-heavy. This is ONE whole-stage-codegen'd static call per
  * row (`doGenCode` emits a single invocation), the preference order the
  * build brief names: native Expression with codegen > UDF.
  */
case class SimHash64(child: Expression) extends UnaryExpression with Serializable {

  // AbstractDataType (ImplicitCastInputTypes) is private[sql] — the builder
  // functions below insert an explicit Cast to string instead
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  /** Single-pass SimHash over distinct whitespace tokens. Tokenization
    * matches Spark's `split(text, " ")` (regex split, limit -1: trailing
    * empty tokens kept); the hash matches Spark's `xxhash64` (seed 42 over
    * the UTF-8 bytes).
    */
  def compute(s: UTF8String): Long = {
    val tokens = s.toString.split(" ", -1)
    val seen = new java.util.HashSet[String](tokens.length * 2)
    val counts = new Array[Int](64)
    var i = 0
    while (i < tokens.length) {
      val t = tokens(i)
      if (seen.add(t)) {
        val h = XxHash64Function.hash(UTF8String.fromString(t), StringType, 42L)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  val functionName = "graft_simhash64"

  /** Expression builder with an explicit string cast (replaces the
    * private[sql] ImplicitCastInputTypes machinery).
    */
  def build(exprs: Seq[Expression]): Expression =
    SimHash64(if (exprs.head.dataType == StringType) exprs.head
              else Cast(exprs.head, StringType))

  private val registered =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Boolean]())

  /** Register `graft_simhash64` in a session's function registry (idempotent
    * per session). Sessions configured with
    * `spark.sql.extensions=graft.functions.GraftExtensions` get it at build
    * time instead.
    */
  def ensureRegistered(spark: SparkSession): Unit =
    if (registered.add(System.identityHashCode(spark))) {
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(functionName),
        new ExpressionInfo(classOf[SimHash64].getName, functionName),
        (exprs: Seq[Expression]) => build(exprs))
    }
}

/** `spark.sql.extensions` entry point: injects the graft function library
  * into every session built with this extension (the idiomatic cluster-wide
  * registration path; `SimHash64.ensureRegistered` is the per-session
  * fallback used by the library itself).
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier(SimHash64.functionName),
      new ExpressionInfo(classOf[SimHash64].getName, SimHash64.functionName),
      (exprs: Seq[Expression]) => SimHash64.build(exprs)))
    ext.injectFunction((
      FunctionIdentifier(SimhashSubsetKeys.functionName),
      new ExpressionInfo(classOf[SimhashSubsetKeys].getName, SimhashSubsetKeys.functionName),
      (exprs: Seq[Expression]) => SimhashSubsetKeys.build(exprs)))
  }
}

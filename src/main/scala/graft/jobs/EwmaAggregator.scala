package graft.jobs

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Order-aware EWMA as a typed Aggregator (SURVEY.md §7.2 / A1).
  *
  * The reference folds `avg = 0.9*old + 0.1*new` in arrival order
  * (database.py:259-266). An arbitrary-merge-order distributed aggregate
  * cannot reproduce a sequential fold, so the buffer keeps the (tiny) set of
  * (sequence, value) observations and folds them sorted at `finish`. Use for
  * low-cardinality sequences (per-platform per-round latencies); for
  * unbounded streams use the closed-form window in Reports.platformHealth.
  */
class EwmaAggregator(alpha: Double = 0.1)
    extends Aggregator[(Long, Double), Seq[(Long, Double)], Double] {

  override def zero: Seq[(Long, Double)] = Vector.empty

  override def reduce(buf: Seq[(Long, Double)], obs: (Long, Double)): Seq[(Long, Double)] =
    buf :+ obs

  override def merge(a: Seq[(Long, Double)], b: Seq[(Long, Double)]): Seq[(Long, Double)] =
    a ++ b

  override def finish(buf: Seq[(Long, Double)]): Double = {
    val sorted = buf.sortBy(_._1)
    sorted.toList match {
      case Nil => 0.0
      case (_, first) :: rest =>
        rest.foldLeft(first) { case (acc, (_, v)) => (1 - alpha) * acc + alpha * v }
    }
  }

  override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object EwmaAggregator {
  import org.apache.spark.sql.functions.udaf

  /** Column function: ewma over (seq, value) pairs folded in seq order. */
  def ewma(alpha: Double = 0.1): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new EwmaAggregator(alpha), Encoders.product[(Long, Double)])
}

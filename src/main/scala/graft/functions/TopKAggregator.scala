package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** A scored row for per-group top-k aggregation. */
case class ScoredId(score: Double, id: Long)

/** Single-pass per-group top-k (bounded buffer), as a typed Aggregator.
  *
  * The Window + row_number formulation must sort every group's full row
  * set; this aggregator keeps only k rows per group in the partial
  * buffers, so the shuffle carries O(groups × k) instead of O(rows) —
  * the right shape at 100 TB when k ≪ group size. Order matches the
  * window variant: (score DESC, id ASC).
  *
  * Buffer trimming keeps the buffer tiny; for large k a binary heap
  * would replace the sort-and-take, without changing the contract.
  */
class TopKAggregator(k: Int)
    extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {

  private def trim(s: Seq[ScoredId]): Seq[ScoredId] =
    s.sortBy(x => (-x.score, x.id)).take(k)

  override def zero: Seq[ScoredId] = Nil

  override def reduce(b: Seq[ScoredId], a: ScoredId): Seq[ScoredId] =
    if (b.size < k) trim(a +: b)
    else {
      val worst = b.last // b is kept trimmed (sorted desc)
      if (a.score > worst.score || (a.score == worst.score && a.id < worst.id))
        trim(a +: b)
      else b
    }

  override def merge(x: Seq[ScoredId], y: Seq[ScoredId]): Seq[ScoredId] =
    trim(x ++ y)

  override def finish(b: Seq[ScoredId]): Seq[ScoredId] =
    b.sortBy(x => (-x.score, x.id))

  override def bufferEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
}

package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import scala.collection.mutable

/** One (score, id) candidate for bounded top-k selection. */
case class ScoredId(score: Double, id: Long)

/** Bounded-state top-k by (score DESC, id ASC) as a typed Aggregator — the
  * scale-correct alternative to a `row_number().over(partitionBy(group))`
  * ranking window for per-group top-k.
  *
  * Why this exists: the window formulation shuffles EVERY scored row into
  * its group's partition before ranking — |groups| × |corpus| rows across
  * the wire, and a hot group's whole candidate list on one partition. This
  * aggregate keeps at most [[cap]] candidates per (group × partition) in
  * the partial buffers, so map-side combine reduces each partition's
  * contribution to ≤ k rows and only |groups| × |partitions| × k rows ever
  * shuffle. At 100 TB that is the difference between a terabyte-scale
  * exchange and a megabyte-scale one.
  *
  * Determinism: top-k under the TOTAL order (score DESC, id ASC) is a
  * selection from the input SET — independent of arrival and merge order —
  * so a 1000-executor run is bit-identical to local[1] (required for the
  * DuckDB-oracle hash compare; ids must be distinct within a group, which
  * every call site guarantees by construction).
  *
  * Compaction policy: buffers grow to [[cap]] = 4k before sort-truncating
  * to k (amortizes the sort), and truncation to k is LOSSLESS for top-k —
  * a candidate outside a partial's top k can never enter the global top k.
  */
class TopKByScoreAggregator(k: Int)
    extends Aggregator[ScoredId, mutable.ArrayBuffer[ScoredId], Seq[ScoredId]] {
  require(k > 0, s"top-k needs k > 0, got $k")
  private val cap = 4 * k

  override def zero: mutable.ArrayBuffer[ScoredId] = mutable.ArrayBuffer.empty

  private def compact(b: mutable.ArrayBuffer[ScoredId]): mutable.ArrayBuffer[ScoredId] = {
    val kept = b.sortBy(s => (-s.score, s.id)).take(k)
    b.clear()
    b ++= kept
  }

  override def reduce(b: mutable.ArrayBuffer[ScoredId], v: ScoredId): mutable.ArrayBuffer[ScoredId] = {
    b += v
    if (b.length > cap) compact(b) else b
  }

  override def merge(a: mutable.ArrayBuffer[ScoredId], b: mutable.ArrayBuffer[ScoredId]): mutable.ArrayBuffer[ScoredId] = {
    a ++= b
    if (a.length > cap) compact(a) else a
  }

  /** Final order IS the rank order: score DESC, id ASC. */
  override def finish(b: mutable.ArrayBuffer[ScoredId]): Seq[ScoredId] =
    b.sortBy(s => (-s.score, s.id)).take(k).toSeq

  override def bufferEncoder: Encoder[mutable.ArrayBuffer[ScoredId]] =
    Encoders.kryo[mutable.ArrayBuffer[ScoredId]]
  override def outputEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder[Seq[ScoredId]]()

  /** Input encoder for the udaf() call site — (score, id) column pair. */
  def inputEncoder: Encoder[ScoredId] = ExpressionEncoder[ScoredId]()
}

/** One (count, token) candidate for bounded top-k vocabulary selection. */
case class CountedToken(n: Long, token: String)

/** [[TopKByScoreAggregator]]'s string-payload sibling: top-k by
  * (count DESC, token ASC) for vocabulary-style selections whose identity
  * is a string, not a numeric id. Same bounded-state contract — partial
  * buffers cap at 4·k per (group × partition) and truncation to k is
  * lossless — and the same determinism argument: selection under a total
  * order is independent of arrival and merge order (tokens are distinct
  * within a group by construction at every call site, being group-by
  * keys upstream). Kept as its own small class rather than a generic
  * payload parameter: a type-parameterized Aggregator would drag implicit
  * encoder plumbing through every call site for two concrete uses. */
class TopKTokensAggregator(k: Int)
    extends Aggregator[CountedToken, mutable.ArrayBuffer[CountedToken], Seq[CountedToken]] {
  require(k > 0, s"top-k needs k > 0, got $k")
  private val cap = 4 * k

  override def zero: mutable.ArrayBuffer[CountedToken] = mutable.ArrayBuffer.empty

  private def compact(b: mutable.ArrayBuffer[CountedToken]): mutable.ArrayBuffer[CountedToken] = {
    val kept = b.sortBy(t => (-t.n, t.token)).take(k)
    b.clear()
    b ++= kept
  }

  override def reduce(b: mutable.ArrayBuffer[CountedToken], v: CountedToken): mutable.ArrayBuffer[CountedToken] = {
    b += v
    if (b.length > cap) compact(b) else b
  }

  override def merge(a: mutable.ArrayBuffer[CountedToken], b: mutable.ArrayBuffer[CountedToken]): mutable.ArrayBuffer[CountedToken] = {
    a ++= b
    if (a.length > cap) compact(a) else a
  }

  /** Final order IS the rank order: count DESC, token ASC. */
  override def finish(b: mutable.ArrayBuffer[CountedToken]): Seq[CountedToken] =
    b.sortBy(t => (-t.n, t.token)).take(k).toSeq

  override def bufferEncoder: Encoder[mutable.ArrayBuffer[CountedToken]] =
    Encoders.kryo[mutable.ArrayBuffer[CountedToken]]
  override def outputEncoder: Encoder[Seq[CountedToken]] = ExpressionEncoder[Seq[CountedToken]]()

  /** Input encoder for the udaf() call site — (n, token) column pair. */
  def inputEncoder: Encoder[CountedToken] = ExpressionEncoder[CountedToken]()
}

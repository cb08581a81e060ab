package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import scala.collection.mutable

/** Misra-Gries heavy-hitter sketch as a typed Aggregator — the
  * bounded-state CANDIDATE GENERATOR for exact frequent-item reporting
  * ([[graft.queries.ExtQueries.heavyHitters]]): one pass with k−1 counters
  * per partial buffer, merge, and every token whose true frequency exceeds
  * N/k is guaranteed to survive (Misra & Gries '82; merge rule and its
  * error proof from Agarwal et al., "Mergeable Summaries", PODS'12).
  *
  * Why a sketch when [[graft.queries.ExtQueries.topTokens]] already
  * groups the whole vocabulary: a full `groupBy(token)` shuffles
  * |vocabulary| rows — fine for bounded vocabularies, quadratically
  * wasteful when the domain is open (URLs, user ids, n-grams at 100 TB)
  * and only the > N/k outliers matter. This buffer is ≤ k−1 counters per
  * (group × partition) REGARDLESS of domain size, so the shuffle carries
  * |partitions| sketches instead of the domain. The guarantee direction
  * matters: the sketch may keep false positives (undercounted hangers-on)
  * but NEVER drops a true heavy hitter, so a second exact-recount pass
  * over the candidate set — |candidates| ≤ k−1 rows, broadcast — yields
  * the exact answer. The final output therefore does not depend on sketch
  * internals at all; the sketch only bounds how much work pass 2 does.
  *
  * Determinism: the candidate SET a partial run produces depends on
  * arrival order (classic MG), but the operator's OUTPUT is
  * order-invariant — it is {token : freq·k > N}, recounted exactly —
  * which is what the cross-engine hash gate checks. [[finish]] still
  * sorts the candidates so the intermediate array is reproducible in
  * tests.
  *
  * Invariants maintained: counters hold at most k−1 entries with strictly
  * positive counts; for every token t, count(t) ≥ freq_seen(t) − D where
  * D is the total decrement debt, and D ≤ N/k by the counting argument
  * (each unit of debt retires k units of arrivals: the decremented new
  * item plus k−1 surviving counters). */
class MisraGriesAggregator(k: Int)
    extends Aggregator[String, mutable.Map[String, Long], Seq[String]] {
  require(k > 1, s"misra-gries needs k > 1, got $k")
  private val counters = k - 1

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  override def reduce(b: mutable.Map[String, Long], tok: String): mutable.Map[String, Long] = {
    if (tok != null) {
      b.get(tok) match {
        case Some(n) => b.update(tok, n + 1L)
        case None if b.size < counters => b.update(tok, 1L)
        case None =>
          // decrement-all: the arriving token and every counter each give
          // up one unit — k units retired per debt unit, hence D ≤ N/k
          val dead = mutable.ArrayBuffer.empty[String]
          b.mapValuesInPlace { (_, n) => n - 1L }
          b.foreach { case (t, n) => if (n <= 0L) dead += t }
          dead.foreach(b.remove)
      }
    }
    b
  }

  /** Sum counters, then if over budget subtract the (k)-th largest value
    * from every counter and drop the non-positive — the PODS'12 merge:
    * at least k counters each retire v units per v of new debt, so the
    * combined debt stays ≤ (N₁+N₂)/k and the survival guarantee holds
    * across arbitrary merge trees (Spark's partial-aggregate shape). */
  override def merge(a: mutable.Map[String, Long], b: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    b.foreach { case (t, n) => a.update(t, a.getOrElse(t, 0L) + n) }
    if (a.size > counters) {
      val vals = a.values.toArray
      java.util.Arrays.sort(vals)
      val v = vals(vals.length - counters - 1) // (k)-th largest = cut value
      val dead = mutable.ArrayBuffer.empty[String]
      a.mapValuesInPlace { (_, n) => n - v }
      a.foreach { case (t, n) => if (n <= 0L) dead += t }
      dead.foreach(a.remove)
    }
    a
  }

  /** Sorted candidate tokens (≤ k−1), superset of all > N/k items. */
  override def finish(b: mutable.Map[String, Long]): Seq[String] =
    b.keys.toSeq.sorted

  override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    Encoders.kryo[mutable.Map[String, Long]]
  override def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder[Seq[String]]()

  /** Input encoder for the udaf() call site — the token column. */
  def inputEncoder: Encoder[String] = Encoders.STRING
}

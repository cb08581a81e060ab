package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}
import scala.collection.mutable

/** Mode (top-1 by frequency) as a custom typed UDAF — the declared
  * custom-aggregate capability from SURVEY.md §2.10 (reference computes mode
  * via pandas `value_counts().idxmax()`, dags/trending_daily_aggregates.py:87
  * and dags/weekly_report.py:36).
  *
  * Tie-break is PINNED: highest count wins, ties resolved toward the LOWEST
  * value (SURVEY.md §7.6 #2 — pandas' tie order is insertion-dependent and
  * not reproducible, so graft fixes a deterministic rule; the window-rank
  * formulation in RefQueries.topCategory and the DuckDB oracle use the same
  * rule, so `q_mode_udaf` and `q_top_category` agree bit-for-bit).
  *
  * Scale note: the buffer is a value→count map, merged associatively across
  * partitions (map-side partial aggregation), so the shuffle carries one map
  * per (group × partition), never raw rows. Cardinality of the moded column
  * is bounded by design (category ids); for unbounded domains use the
  * window-rank form instead.
  */
class LongModeAggregator extends Aggregator[java.lang.Long, mutable.Map[Long, Long], java.lang.Long] {
  override def zero: mutable.Map[Long, Long] = mutable.Map.empty

  /** Null policy: null inputs are IGNORED (contribute to no bucket), matching
    * SQL aggregate semantics — a boxed input encoder makes that explicit
    * instead of throwing on the first null at runtime. */
  override def reduce(b: mutable.Map[Long, Long], v: java.lang.Long): mutable.Map[Long, Long] = {
    if (v != null) b.update(v.longValue, b.getOrElse(v.longValue, 0L) + 1L)
    b
  }

  override def merge(a: mutable.Map[Long, Long], b: mutable.Map[Long, Long]): mutable.Map[Long, Long] = {
    b.foreach { case (k, n) => a.update(k, a.getOrElse(k, 0L) + n) }
    a
  }

  /** count DESC, value ASC — the pinned deterministic rule. An all-null (or
    * empty) group yields SQL NULL, matching aggregate semantics — no sentinel
    * value that could collide with real data. */
  override def finish(m: mutable.Map[Long, Long]): java.lang.Long =
    if (m.isEmpty) null
    else java.lang.Long.valueOf(m.minBy { case (v, n) => (-n, v) }._1)

  override def bufferEncoder: Encoder[mutable.Map[Long, Long]] =
    implicitly[Encoder[mutable.Map[Long, Long]]](Encoders.kryo[mutable.Map[Long, Long]])
  override def outputEncoder: Encoder[java.lang.Long] = Encoders.LONG

  /** Nullable-input encoder — passed explicitly at the udaf() call site
    * (RefQueries.modeUdaf) so nulls reach [[reduce]] boxed, not thrown on. */
  def inputEncoder: Encoder[java.lang.Long] = Encoders.LONG
}

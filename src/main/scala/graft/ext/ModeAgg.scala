package graft.ext

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator surface (SURVEY.md §2.7 ext): exact mode (most
  * frequent value) with a deterministic tie-break (smallest value wins).
  * Replaces the reference's two-query argmax idiom (etl.py:181-207) with
  * a single mergeable aggregate — one shuffle, map-side partials, and the
  * buffer merges associatively so it's partition-count independent.
  *
  * Scale note: buffer size is O(distinct values per group); for
  * high-cardinality columns swap the Map for a count-min sketch — the
  * Aggregator contract stays identical.
  */
object ModeAgg extends Aggregator[String, Map[String, Long], String] {
  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
    if (a == null) b else b.updated(a, b.getOrElse(a, 0L) + 1L)

  override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] =
    y.foldLeft(x) { case (acc, (k, v)) => acc.updated(k, acc.getOrElse(k, 0L) + v) }

  /** Most frequent value; ties broken by smallest value (deterministic). */
  override def finish(b: Map[String, Long]): String =
    if (b.isEmpty) null
    else b.toSeq.maxBy { case (v, n) => (n, v) }(
      Ordering.Tuple2(Ordering.Long, Ordering.String.reverse))._1

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
  override def outputEncoder: Encoder[String] = Encoders.STRING
}

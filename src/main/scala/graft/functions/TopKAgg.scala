package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Input row for [[TopKKeysAgg]]: a ranked value and the id to report. */
final case class TopKEntry(v: Double, id: Long)

/** Bounded aggregation buffer: at most k entries, kept in rank order. */
final case class TopKBuf(entries: Seq[TopKEntry])

/** Per-group bounded top-k as a custom AGGREGATE FUNCTION (typed
  * `Aggregator`, registered through `functions.udaf`) — the third
  * spelling of per-key top-k in this repo, and the only one that
  * COMPOSES: `groupBy(key).agg(count(...), sum(...), topk(...))` runs in
  * ONE aggregate pass, where the window spelling needs a separate
  * sort+filter pass and the [[graft.plans.TopKPerKey]] physical operator
  * needs a join back for the other aggregates. Buffer state is bounded
  * at k entries per group per partition and merges associatively (top-k
  * under a total order is a semilattice — the same argument as the
  * physical operator), so partial aggregation and AQE work unchanged.
  *
  * Output is the top-k ids as a comma-joined string in rank order
  * (value desc, id asc — total when ids are unique), the
  * engine-portable rendering the postings index uses. The per-row
  * re-sort in `reduce` is O(k log k) with k tiny; a binary insert is
  * the production upgrade and changes nothing observable. */
final class TopKKeysAgg(k: Int)
    extends Aggregator[TopKEntry, TopKBuf, String] {
  require(k > 0, "top-k needs k > 0")
  private def cap(es: Seq[TopKEntry]): Seq[TopKEntry] =
    es.sortBy(e => (-e.v, e.id)).take(k)
  override def zero: TopKBuf = TopKBuf(Nil)
  override def reduce(b: TopKBuf, a: TopKEntry): TopKBuf =
    TopKBuf(cap(b.entries :+ a))
  override def merge(x: TopKBuf, y: TopKBuf): TopKBuf =
    TopKBuf(cap(x.entries ++ y.entries))
  override def finish(b: TopKBuf): String =
    cap(b.entries).map(_.id).mkString(",")
  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[String] = Encoders.STRING
}

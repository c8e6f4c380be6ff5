package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable.ArrayBuffer

/** Collect up to `maxKeep` (doc_id, set_size) entries per group; once the
  * group's TRUE cardinality exceeds `maxKeep`, emit empty — equivalent to
  * dropping the group, which is exactly the hot-gram guard `jaccardPairsFast`
  * needs (grams hotter than maxDf are stopword-shaped noise).
  *
  * Why an Aggregator instead of a pre-filter: the previous design counted
  * document frequencies in a SEPARATE job and anti-joined the hot set out,
  * which evaluated the gram-hash UDF over the whole corpus twice and paid an
  * extra (g, count) shuffle. This runs in the ONE groupBy-gram shuffle the
  * pipeline already does, and the partial-aggregation buffers are hard-capped
  * at maxKeep entries (~maxKeep·12 B), so a stopword gram costs each map task
  * a bounded buffer instead of a multi-GB doc list: the guard's scale
  * property is preserved, buffer-side instead of filter-side.
  *
  * (At sf0.1 this took q33_jaccard_default from ~2.3 s to the same cost as
  * the exact maxDf=0 path, since the guard no longer adds a pass.)
  */
final class BoundedCollectAgg(maxKeep: Int)
    extends Aggregator[(Long, Int), BoundedCollectAgg.Buf, Seq[(Long, Int)]] {
  import BoundedCollectAgg.Buf

  override def zero: Buf = Buf(ArrayBuffer.empty, 0L)

  override def reduce(b: Buf, a: (Long, Int)): Buf = {
    b.count += 1
    if (b.count <= maxKeep) b.items += a
    else if (b.items.nonEmpty) b.items.clear() // overflowed: stop buffering
    b
  }

  override def merge(x: Buf, y: Buf): Buf = {
    x.count += y.count
    if (x.count <= maxKeep) x.items ++= y.items
    else if (x.items.nonEmpty) x.items.clear()
    x
  }

  override def finish(b: Buf): Seq[(Long, Int)] =
    // no sort: the pair-combos UDFs downstream orient each emitted pair
    // (a < b) themselves, so group order is unobservable (r20 — the sort
    // cost O(df log df) per gram for nothing but pair orientation)
    if (b.count > maxKeep) Nil
    else b.items.toSeq

  override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
  override def outputEncoder: Encoder[Seq[(Long, Int)]] = ExpressionEncoder()
}

object BoundedCollectAgg {
  /** `count` is the group's TRUE cardinality; `items` holds at most the
    * aggregator's maxKeep entries and empties permanently on overflow. */
  final case class Buf(items: ArrayBuffer[(Long, Int)], var count: Long)
}

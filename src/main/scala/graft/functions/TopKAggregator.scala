package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One scored neighbor candidate flowing into the top-k aggregate.
  * (Top-level public case class: Janino-generated encoder code cannot access
  * nested/private classes.) */
case class Neighbor(c_id: Long, label: Int, score: Double)

/** Aggregation buffer/result wrapper — a product type so the buffer encoder
  * stays a columnar struct (array of structs), not opaque kryo bytes. */
case class TopKBuf(items: Seq[Neighbor])

/** Fused top-k accumulator as a typed `Aggregator`: keeps only the k best
  * (score DESC, c_id ASC) candidates per group, in both the partial (map-side)
  * and final aggregation stages.
  *
  * Why this exists (SURVEY.md §4.2 "fused top-k accumulator — performance"):
  * the window-function top-k (`row_number` over partitionBy(q_id)) must
  * shuffle and SORT every candidate row — O(N log N) per query key with all
  * N·Q pair rows crossing the wire. This aggregate keeps O(k) state per key,
  * shuffles exactly Q·k partial rows after map-side combine, and never
  * materializes a global sort — the shape that survives a 100× scale-up of
  * the candidate set.
  */
/** One (candidate id, distance) pair flowing into the min-k aggregate —
  * the DISTANCE-ordered sibling of Neighbor for ADC-style searches where
  * smaller is better and the label attaches after the k survivors. */
case class DistCand(c_id: Long, dist: Double)

/** Buffer/result wrapper for MinKByDistance (columnar struct encoder). */
case class MinKBuf(items: Seq[DistCand])

/** Fused min-k accumulator (dist ASC, c_id ASC tie-break): same O(k)-state /
  * Q·k-shuffle shape as TopKNeighbors but ordered for distances. Used by the
  * PQ/ADC search path (VERDICT r7 #3) where the window-sort alternative
  * would buffer every candidate row per query key. */
class MinKByDistance(k: Int) extends Aggregator[DistCand, MinKBuf, MinKBuf] {
  private val ord: Ordering[DistCand] =
    Ordering.by((n: DistCand) => (n.dist, n.c_id))

  override def zero: MinKBuf = MinKBuf(Vector.empty)

  override def reduce(b: MinKBuf, a: DistCand): MinKBuf =
    if (b.items.size < k) MinKBuf((b.items :+ a).sorted(ord))
    else if (ord.lt(a, b.items.last)) MinKBuf((b.items.init :+ a).sorted(ord))
    else b

  override def merge(x: MinKBuf, y: MinKBuf): MinKBuf =
    MinKBuf((x.items ++ y.items).sorted(ord).take(k))

  override def finish(r: MinKBuf): MinKBuf = r

  override def bufferEncoder: Encoder[MinKBuf] = Encoders.product[MinKBuf]
  override def outputEncoder: Encoder[MinKBuf] = Encoders.product[MinKBuf]
}

class TopKNeighbors(k: Int) extends Aggregator[Neighbor, TopKBuf, TopKBuf] {
  private val ord: Ordering[Neighbor] =
    Ordering.by((n: Neighbor) => (-n.score, n.c_id))

  override def zero: TopKBuf = TopKBuf(Vector.empty)

  override def reduce(b: TopKBuf, a: Neighbor): TopKBuf =
    if (b.items.size < k) TopKBuf((b.items :+ a).sorted(ord))
    else if (ord.lt(a, b.items.last)) TopKBuf((b.items.init :+ a).sorted(ord))
    else b

  override def merge(x: TopKBuf, y: TopKBuf): TopKBuf =
    TopKBuf((x.items ++ y.items).sorted(ord).take(k))

  override def finish(r: TopKBuf): TopKBuf = r

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}

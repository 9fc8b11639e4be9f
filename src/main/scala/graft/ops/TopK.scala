package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-key top-N as a bounded-heap aggregate — the scale form of
  * "rank within group, keep the first k".
  *
  * The window encoding (`row_number().over(partitionBy(key).orderBy(
  * score))` + filter) shuffles EVERY row of every group and sorts each
  * group fully, to then discard all but k rows. This operator keeps a
  * k-bounded min-heap per key inside a partial aggregation instead:
  * the map side combines locally, so the shuffle carries at most k
  * entries per (key, map partition) and nothing is ever globally
  * sorted. Same result, bounded by design — the distributed twin of
  * the reference's per-ID min-max heaps (heap.go via stats.go:131-146),
  * expressed as a Spark `Aggregator` so Catalyst plans it as a regular
  * two-phase ObjectHashAggregate.
  *
  * Ranking is (score desc, id asc) — `row_number` semantics with a
  * deterministic tiebreak, matching the SQL-window oracle exactly.
  */
object TopK {

  final case class Scored(score: Double, id: Long)

  /** k-bounded heap; head of the queue is the WORST kept entry (lowest
    * score, then highest id), so admission is an O(1) compare and
    * eviction is O(log k). */
  final class Heap(val k: Int) extends Serializable {
    private val worstFirst: Ordering[Scored] =
      Ordering.by(s => (-s.score, s.id))
    val q: mutable.PriorityQueue[Scored] =
      mutable.PriorityQueue.empty[Scored](worstFirst)
    private def better(a: Scored, b: Scored): Boolean =
      a.score > b.score || (a.score == b.score && a.id < b.id)
    def add(s: Scored): Heap = {
      if (q.size < k) q.enqueue(s)
      else if (better(s, q.head)) { q.dequeue(); q.enqueue(s) }
      this
    }
    def mergeWith(o: Heap): Heap = { o.q.foreach(add); this }
    def drain: Seq[Scored] =
      q.toSeq.sortBy(s => (-s.score, s.id))
  }

  private def heapAgg(k: Int): Aggregator[Scored, Heap, Seq[Scored]] =
    new Aggregator[Scored, Heap, Seq[Scored]] {
      def zero: Heap = new Heap(k)
      def reduce(b: Heap, a: Scored): Heap = b.add(a)
      def merge(b1: Heap, b2: Heap): Heap = b1.mergeWith(b2)
      def finish(r: Heap): Seq[Scored] = r.drain
      def bufferEncoder: Encoder[Heap] = Encoders.kryo[Heap]
      def outputEncoder: Encoder[Seq[Scored]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
    }

  /** Top `k` rows per `keyCols` group by (`scoreCol` desc, `idCol`
    * asc). Output: keyCols ++ (scoreCol, idCol, rk) with rk 1-based —
    * column-compatible with the row_number window form. */
  def byScore(df: DataFrame, keyCols: Seq[String], scoreCol: String,
      idCol: String, k: Int): DataFrame = {
    val u = udaf(heapAgg(k), Encoders.product[Scored])
    df.groupBy(keyCols.map(col): _*)
      .agg(u(col(scoreCol).cast("double"), col(idCol).cast("long")).as("__top"))
      .select(keyCols.map(col) :+ posexplode(col("__top")): _*)
      .select(keyCols.map(col) ++ Seq(
        col("col.score").as(scoreCol),
        col("col.id").as(idCol),
        (col("pos") + 1).cast("int").as("rk")): _*)
  }
}

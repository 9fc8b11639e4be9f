package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftClassicBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DataType, DateType, IntegerType, LongType, TimestampNTZType, TimestampType}

/** Second whole-operator Catalyst extension (SURVEY §2.9 point (c),
  * the [[AsOfMergeJoin]] plumbing applied to a different semantic):
  * a PHYSICAL keyed interval-overlap join.
  *
  *   logical [[IntervalJoinNode]] → planner [[IntervalJoinStrategy]]
  *   → physical [[IntervalSweepJoinExec]]
  *
  * Inner-joins rows with EQUAL keys whose half-open intervals
  * strictly overlap: `l.start < r.end AND r.start < l.end`. The exec
  * declares `ClusteredDistribution`(keys) on both children and a
  * (keys…, start) `requiredChildOrdering`, so EnsureRequirements
  * plans exactly one exchange + sort per side; each co-partition then
  * runs ONE interleaved sweep in start order, holding only the
  * currently-open intervals of each side (evicted the moment their
  * end passes the sweep line). Contrast with the declarative
  * [[graft.ops.RangeJoin.overlapByBinning]]: no bin width to tune, no
  * bin-exploded shuffle rows (each input row shuffles ONCE), and the
  * per-key working set is the true concurrent-overlap count — the
  * lower bound any interval join pays. Memory: max open intervals
  * per key at one instant (not per key total); a key whose intervals
  * all overlap simultaneously degrades to the output size itself,
  * which is inherent to the join.
  *
  * Column plumbing follows [[AsOfMergeJoin]] exactly: names, not
  * captured Attributes (self-joins get re-aliased exprIds by
  * DeduplicateRelations); `references` claims both children's full
  * outputs so pruning cannot drop sweep columns; both children's
  * `requiredNumPartitions` pin the session shuffle-partition count so
  * AQE cannot coalesce the two shuffles differently (zipPartitions
  * pairs positionally). Keys compare as projected UnsafeRows under
  * the same interpreted natural ordering the required sort used;
  * start/end must be integer- or timestamp-typed and non-null (the
  * API filters nulls). Output: all left columns, then `iv_start`,
  * `iv_end` and `iv_<v>` for each right value column — one row per
  * overlapping pair, exact row-for-row parity with the inequality
  * join asserted in IntervalSweepJoinSpec.
  */
object IntervalSweepJoin {

  /** Keyed interval-overlap inner join through the custom physical
    * operator. */
  def overlap(left: DataFrame, right: DataFrame, keys: Seq[String],
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      rightVals: Seq[String]): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(IntervalJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ IntervalJoinStrategy
    }
    GraftClassicBridge.ofRows(spark,
      buildNode(left, right, keys, lStart, lEnd, rStart, rEnd, rightVals))
  }

  private[graft] def buildNode(left: DataFrame, right: DataFrame,
      keys: Seq[String], lStart: String, lEnd: String, rStart: String,
      rEnd: String, rightVals: Seq[String]): IntervalJoinNode = {
    require(keys.nonEmpty, "interval join needs at least one key column")
    val lNotNull = (keys :+ lStart :+ lEnd).map(col(_).isNotNull)
      .reduce(_ && _)
    val rNotNull = (keys :+ rStart :+ rEnd).map(col(_).isNotNull)
      .reduce(_ && _)
    val lp = left.where(lNotNull).queryExecution.analyzed
    val rp = right.where(rNotNull).queryExecution.analyzed
    val rS = AsOfJoinNode.byName(rp.output, rStart)
    val rE = AsOfJoinNode.byName(rp.output, rEnd)
    val rVals = rightVals.map(AsOfJoinNode.byName(rp.output, _))
    val ivOut =
      AttributeReference("iv_start", rS.dataType, nullable = false)() +:
        AttributeReference("iv_end", rE.dataType, nullable = false)() +:
        rVals.map(v =>
          AttributeReference(s"iv_${v.name}", v.dataType, v.nullable)())
    IntervalJoinNode(lp, rp, keys, lStart, lEnd, rStart, rEnd, rightVals,
      ivOut)
  }
}

/** Logical keyed interval join; see [[AsOfJoinNode]] for the
  * fixed-output / full-references rationale. */
case class IntervalJoinNode(left: LogicalPlan, right: LogicalPlan,
    keys: Seq[String], lStart: String, lEnd: String, rStart: String,
    rEnd: String, rightVals: Seq[String], ivOut: Seq[Attribute])
  extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ ivOut
  override def references: AttributeSet =
    AttributeSet(left.output ++ right.output)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): IntervalJoinNode =
    copy(left = newLeft, right = newRight)
}

object IntervalJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: IntervalJoinNode =>
      IntervalSweepJoinExec(n.keys, n.lStart, n.lEnd, n.rStart, n.rEnd,
        n.rightVals, n.ivOut, planLater(n.left), planLater(n.right)) :: Nil
    case _ => Nil
  }
}

/** Max-over-tasks accumulator: reports the largest value any task
  * added (merge = max, not sum). Used for the sweep's open-interval
  * working set — the operator's true memory bound, which ScaleCheck
  * asserts stays ~constant while the corpus grows. */
class MaxLongAccumulator extends org.apache.spark.util.AccumulatorV2[Long, Long] {
  private var m = 0L
  override def isZero: Boolean = m == 0L
  override def copy(): MaxLongAccumulator = {
    val c = new MaxLongAccumulator; c.m = m; c
  }
  override def reset(): Unit = m = 0L
  override def add(v: Long): Unit = if (v > m) m = v
  override def merge(
      other: org.apache.spark.util.AccumulatorV2[Long, Long]): Unit =
    if (other.value > m) m = other.value
  override def value: Long = m
}

case class IntervalSweepJoinExec(keys: Seq[String], lStart: String,
    lEnd: String, rStart: String, rEnd: String, rightVals: Seq[String],
    ivOut: Seq[Attribute], left: SparkPlan, right: SparkPlan)
  extends BinaryExecNode {

  /** Largest (openL + openR) working set any sweep held — the
    * operator's memory bound (equals the true max concurrent overlap
    * of one key, NOT corpus size). Registered lazily on first
    * execute; read it from the EXECUTED plan's exec instance
    * (plan preparation copies the node). */
  @transient lazy val maxOpenIntervals: MaxLongAccumulator = {
    val acc = new MaxLongAccumulator
    sparkContext.register(acc, "graft.intervalSweep.maxOpenIntervals")
    acc
  }

  private def lKeys = keys.map(AsOfJoinNode.byName(left.output, _))
  private def rKeys = keys.map(AsOfJoinNode.byName(right.output, _))
  private def lS = AsOfJoinNode.byName(left.output, lStart)
  private def lE = AsOfJoinNode.byName(left.output, lEnd)
  private def rS = AsOfJoinNode.byName(right.output, rStart)
  private def rE = AsOfJoinNode.byName(right.output, rEnd)

  override def output: Seq[Attribute] = left.output ++ ivOut

  override def requiredChildDistribution: Seq[Distribution] = {
    val n = Some(conf.numShufflePartitions)
    ClusteredDistribution(lKeys, requiredNumPartitions = n) ::
      ClusteredDistribution(rKeys, requiredNumPartitions = n) :: Nil
  }

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(lKeys.map(SortOrder(_, Ascending)) :+ SortOrder(lS, Ascending),
      rKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rS, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  private def longGetter(dt: DataType, ord: Int): InternalRow => Long =
    dt match {
      case LongType | TimestampType | TimestampNTZType => r => r.getLong(ord)
      case IntegerType | DateType => r => r.getInt(ord).toLong
      case other => throw new IllegalArgumentException(
        s"interval bounds must be integer- or timestamp-typed, got $other")
    }

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lGetS = longGetter(lS.dataType, lOut.indexOf(lS))
    val lGetE = longGetter(lE.dataType, lOut.indexOf(lE))
    val rGetS = longGetter(rS.dataType, rOut.indexOf(rS))
    val rGetE = longGetter(rE.dataType, rOut.indexOf(rE))
    val payloadExprs =
      rS +: rE +: rightVals.map(AsOfJoinNode.byName(rOut, _))
    val outAttrs = output
    val joinedSchema = lOut ++ ivOut
    val lKeyAttrs = lKeys
    val rKeyAttrs = rKeys
    val keyTypes = lKeyAttrs.map(_.dataType)
    val openAcc = maxOpenIntervals

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyAttrs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyAttrs, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val payloadProj = UnsafeProjection.create(payloadExprs, rOut)
      val outProj = UnsafeProjection.create(outAttrs, joinedSchema)
      val joined = new JoinedRow
      val lBuf = lIter.buffered
      val rBuf = rIter.buffered
      // Open intervals of the CURRENT key only: (start, end, row).
      // Left stores the full row (it is the output's left half);
      // right stores the projected payload.
      val openL = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, InternalRow)]
      val openR = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, UnsafeRow)]
      val outQ = new java.util.ArrayDeque[(InternalRow, InternalRow)]()

      new Iterator[InternalRow] {
        private var curKey: UnsafeRow = _

        private def onNewKey(k: UnsafeRow): Unit =
          if (curKey == null || keyOrd.compare(curKey, k) != 0) {
            openL.clear(); openR.clear()
            curKey = k.copy()
          }

        private def fill(): Unit = {
          while (outQ.isEmpty && (lBuf.hasNext || rBuf.hasNext)) {
            val takeLeft =
              if (!rBuf.hasNext) true
              else if (!lBuf.hasNext) false
              else {
                val c = keyOrd.compare(lKeyProj(lBuf.head),
                  rKeyProj(rBuf.head))
                if (c != 0) c < 0
                else lGetS(lBuf.head) <= rGetS(rBuf.head)
              }
            if (takeLeft) {
              val l = lBuf.next()
              onNewKey(lKeyProj(l))
              val ls = lGetS(l); val le = lGetE(l)
              openR.filterInPlace(_._2 > ls) // closed before the sweep line
              val lCopy = l.copy()
              var i = 0
              while (i < openR.length) {
                val o = openR(i)
                if (o._2 > ls && o._1 < le) outQ.add((lCopy, o._3))
                i += 1
              }
              openL += ((ls, le, lCopy))
              openAcc.add(openL.length.toLong + openR.length)
            } else {
              val r = rBuf.next()
              onNewKey(rKeyProj(r))
              val rs = rGetS(r); val re = rGetE(r)
              openL.filterInPlace(_._2 > rs)
              val rp = payloadProj(r).copy()
              var i = 0
              while (i < openL.length) {
                val o = openL(i)
                if (o._2 > rs && o._1 < re) outQ.add((o._3, rp))
                i += 1
              }
              openR += ((rs, re, rp))
              openAcc.add(openL.length.toLong + openR.length)
            }
          }
        }

        override def hasNext: Boolean = { fill(); !outQ.isEmpty }
        override def next(): InternalRow = {
          fill()
          val (a, b) = outQ.poll()
          outProj(joined(a, b))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): IntervalSweepJoinExec =
    copy(left = newLeft, right = newRight)
}

package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftClassicBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DataType, DateType, IntegerType, LongType, TimestampNTZType, TimestampType}

/** The full Spark extension path (SURVEY §2.9 point (c)), exercised
  * for a whole-operator semantic Spark lacks: a PHYSICAL as-of join.
  *
  *   logical [[AsOfJoinNode]]  →  planner [[AsOfJoinStrategy]]  →
  *   physical [[AsOfMergeJoinExec]]
  *
  * The exec declares `ClusteredDistribution`(keys) on both children
  * and a (keys..., ts) `requiredChildOrdering`, so EnsureRequirements
  * plans exactly the exchanges+sorts a SortMergeJoin would get; the
  * operator itself is then a single forward merge per co-partition —
  * each input row is touched ONCE, no per-key window state, no
  * pairwise blowup, and the output streams in left order. This is
  * the algorithm you want at 100 TB: one shuffle of each side on the
  * keys (identical cost to [[graft.ops.AsOfJoin]]'s union-sweep) but
  * no window buffer and a sort that can spill independently per side.
  * Both children's `requiredNumPartitions` are pinned to the session
  * shuffle-partition count so AQE cannot coalesce the two shuffles
  * differently (zipPartitions pairs partitions positionally).
  *
  * Key/ts/value columns ride the plan BY NAME, resolved against the
  * children's outputs at planning and execution time — the analyzer's
  * DeduplicateRelations legitimately re-aliases one side's exprIds
  * when both children derive from the same scan (a self-as-of is the
  * common case), so captured Attribute references would go stale.
  * Children must therefore have unique column names for key/ts/vals
  * (the API selects them explicitly).
  *
  * Semantics match [[graft.ops.AsOfJoin.asof]] exactly (left outer,
  * inclusive `right.ts <= left.ts`, latest match wins) — asserted
  * row-for-row in AsOfMergeJoinSpec; `right` should be unique per
  * (keys, ts). Join keys may be ANY orderable types (strings, any
  * number of columns — the reference-shaped use keys by path): a
  * single integer/timestamp key takes an allocation-free long-compare
  * fast path, everything else compares projected UnsafeRows with the
  * same interpreted natural ordering the required sort used. `ts`
  * must be integer- or timestamp-typed; keys and ts must be non-null
  * (the API filters nulls on both sides).
  */
object AsOfMergeJoin {

  /** Left-outer as-of join through the custom physical operator.
    * Output: all left columns, then `asof_ts` and `asof_<v>` for each
    * right value column (NULL when no right row precedes). */
  def asof(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightVals: Seq[String]): DataFrame =
    asofKeys(left, right, Seq(key), ts, rightVals)

  /** Composite-key form: rows pair within the equality group of ALL
    * `keys` (e.g. (symbol, venue) or a string path). */
  def asofKeys(left: DataFrame, right: DataFrame, keys: Seq[String],
      ts: String, rightVals: Seq[String]): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    GraftClassicBridge.ofRows(spark,
      buildNode(left, right, keys, ts, rightVals))
  }

  private[graft] def buildNode(left: DataFrame, right: DataFrame,
      key: String, ts: String, rightVals: Seq[String]): AsOfJoinNode =
    buildNode(left, right, Seq(key), ts, rightVals)

  /** The logical node alone (no strategy registration) — the path a
    * cluster session configured with `GraftExtensions` uses, where
    * `injectPlannerStrategy` already installed [[AsOfJoinStrategy]]. */
  private[graft] def buildNode(left: DataFrame, right: DataFrame,
      keys: Seq[String], ts: String, rightVals: Seq[String]): AsOfJoinNode = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    val notNull = (keys :+ ts).map(col(_).isNotNull).reduce(_ && _)
    val lp = left.where(notNull).queryExecution.analyzed
    val rp = right.where(notNull).queryExecution.analyzed
    val rTs = AsOfJoinNode.byName(rp.output, ts)
    val rVals = rightVals.map(AsOfJoinNode.byName(rp.output, _))
    val asofOut =
      AttributeReference("asof_ts", rTs.dataType, nullable = true)() +:
        rVals.map(v =>
          AttributeReference(s"asof_${v.name}", v.dataType, nullable = true)())
    AsOfJoinNode(lp, rp, keys, ts, rightVals, asofOut)
  }
}

object AsOfJoinNode {
  def byName(out: Seq[Attribute], n: String): Attribute = {
    val hits = out.filter(_.name == n)
    require(hits.length == 1,
      s"as-of column '$n' must resolve uniquely in $out")
    hits.head
  }
}

/** Logical as-of join; `asofOut` carries the operator's own output
  * attributes (fixed exprIds — stable across plan copies).
  * `references` claims both children's full outputs so column pruning
  * cannot drop columns the exec reads; pruning above the node works
  * normally. */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
    keys: Seq[String], ts: String, rightVals: Seq[String],
    asofOut: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ asofOut
  override def references: AttributeSet =
    AttributeSet(left.output ++ right.output)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] to [[AsOfMergeJoinExec]]; injected via
  * `spark.experimental.extraStrategies` (session-owned code) or
  * `GraftExtensions` (cluster config). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfMergeJoinExec(n.keys, n.ts, n.rightVals, n.asofOut,
        planLater(n.left), planLater(n.right)) :: Nil
    case _ => Nil
  }
}

case class AsOfMergeJoinExec(keys: Seq[String], ts: String,
    rightVals: Seq[String], asofOut: Seq[Attribute],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  private def lKeys = keys.map(AsOfJoinNode.byName(left.output, _))
  private def lTs = AsOfJoinNode.byName(left.output, ts)
  private def rKeys = keys.map(AsOfJoinNode.byName(right.output, _))
  private def rTs = AsOfJoinNode.byName(right.output, ts)

  override def output: Seq[Attribute] = left.output ++ asofOut

  // Pinned partition count: both shuffles MUST stay positionally
  // aligned for zipPartitions; with requiredNumPartitions set, AQE's
  // coalescing validation rejects any plan that would unpin them.
  override def requiredChildDistribution: Seq[Distribution] = {
    val n = Some(conf.numShufflePartitions)
    ClusteredDistribution(lKeys, requiredNumPartitions = n) ::
      ClusteredDistribution(rKeys, requiredNumPartitions = n) :: Nil
  }

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(lKeys.map(SortOrder(_, Ascending)) :+ SortOrder(lTs, Ascending),
      rKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rTs, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    lKeys.map(SortOrder(_, Ascending)) :+ SortOrder(lTs, Ascending)

  private def isLongish(dt: DataType): Boolean = dt match {
    case LongType | TimestampType | TimestampNTZType |
         IntegerType | DateType => true
    case _ => false
  }

  private def longGetter(dt: DataType, ord: Int): InternalRow => Long =
    dt match {
      case LongType | TimestampType | TimestampNTZType => r => r.getLong(ord)
      case IntegerType | DateType => r => r.getInt(ord).toLong
      case other => throw new IllegalArgumentException(
        s"as-of ts must be integer- or timestamp-typed, got $other")
    }

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lGetTs = longGetter(lTs.dataType, lOut.indexOf(lTs))
    val rGetTs = longGetter(rTs.dataType, rOut.indexOf(rTs))
    val payloadExprs = rTs +: rightVals.map(AsOfJoinNode.byName(rOut, _))
    val outAttrs = output
    val joinedSchema = lOut ++ asofOut
    val nPayload = asofOut.size
    val lKeyAttrs = lKeys
    val rKeyAttrs = rKeys
    val keyTypes = lKeyAttrs.map(_.dataType)
    val fastLongKey = keyTypes.length == 1 && isLongish(keyTypes.head)

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val payloadProj = UnsafeProjection.create(payloadExprs, rOut)
      val outProj = UnsafeProjection.create(outAttrs, joinedSchema)
      val nullPayload = new GenericInternalRow(nPayload)
      val joined = new JoinedRow
      val rBuf = rIter.buffered

      if (fastLongKey) {
        // common case: one integer/timestamp key — compare raw longs,
        // zero allocation per row.
        val lGetKey = longGetter(keyTypes.head, lOut.indexOf(lKeyAttrs.head))
        val rGetKey = longGetter(keyTypes.head, rOut.indexOf(rKeyAttrs.head))
        new Iterator[InternalRow] {
          private var lastPayload: UnsafeRow = _
          private var lastKey: Long = 0L
          override def hasNext: Boolean = lIter.hasNext
          override def next(): InternalRow = {
            val l = lIter.next()
            val lk = lGetKey(l)
            val lt = lGetTs(l)
            var advance = true
            while (advance && rBuf.hasNext) {
              val r = rBuf.head
              val rk = rGetKey(r)
              if (rk < lk || (rk == lk && rGetTs(r) <= lt)) {
                rBuf.next()
                lastPayload = payloadProj(r).copy() // proj reuses its buffer
                lastKey = rk
              } else advance = false
            }
            val payload =
              if (lastPayload != null && lastKey == lk) lastPayload
              else nullPayload
            outProj(joined(l, payload))
          }
        }
      } else {
        // general case: string / composite keys — project each side's
        // key columns to an UnsafeRow and compare with the interpreted
        // natural ascending ordering (the SAME total order the
        // required sort produced, incl. binary UTF8 string order).
        val lKeyProj = UnsafeProjection.create(lKeyAttrs, lOut)
        val rKeyProj = UnsafeProjection.create(rKeyAttrs, rOut)
        val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
        new Iterator[InternalRow] {
          private var lastPayload: UnsafeRow = _
          private var lastKey: UnsafeRow = _
          override def hasNext: Boolean = lIter.hasNext
          override def next(): InternalRow = {
            val l = lIter.next()
            val lk = lKeyProj(l).copy() // rKeyProj below reuses a buffer
            val lt = lGetTs(l)
            var advance = true
            while (advance && rBuf.hasNext) {
              val r = rBuf.head
              val cmp = keyOrd.compare(rKeyProj(r), lk)
              if (cmp < 0 || (cmp == 0 && rGetTs(r) <= lt)) {
                rBuf.next()
                lastPayload = payloadProj(r).copy()
                lastKey = rKeyProj(r).copy()
              } else advance = false
            }
            val payload =
              if (lastPayload != null && keyOrd.compare(lastKey, lk) == 0)
                lastPayload
              else nullPayload
            outProj(joined(l, payload))
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfMergeJoinExec =
    copy(left = newLeft, right = newRight)
}

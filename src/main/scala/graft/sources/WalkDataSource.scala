package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, StringStartsWith}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.ingest.Walker
import graft.model.FileEntry

/** DataSource V2 façade over [[graft.ingest.Walker]] — the filesystem
  * tree as a first-class Spark table:
  *
  * {{{
  *   spark.read.format("graft-walk")
  *     .option("root", "/data").option("seedDepth", "2").load()
  * }}}
  *
  * What the connector surface buys over the library call (and why
  * this is the §2.1/§2.9 shape a SQL user needs):
  *
  *   - '''Partition planning''' = the walker's seeding: the driver
  *     walks only the first `seedDepth` levels at `planInputPartitions`
  *     time; each resulting seed directory becomes an `InputPartition`
  *     (grouped to `partitions`), so executors fan out exactly like
  *     `Walker.walk` — and Spark's scheduler, speculation, and retry
  *     semantics apply per subtree.
  *   - '''Filter pushdown''' (`SupportsPushDownFilters`): a
  *     `path LIKE 'prefix%'` / `startswith` predicate prunes WHOLE
  *     SUBTREES at planning time (a seed survives only if it can
  *     contain the prefix) and is applied row-exactly in the reader —
  *     the reference's key-range restriction (find.go prefix scoping)
  *     at the source. `is_dir = x` is likewise applied in the reader.
  *     Both report as pushed; everything else stays with Spark.
  *   - '''Column pruning''' (`SupportsPushDownRequiredColumns`): the
  *     reader materializes only requested fields into `InternalRow`s.
  *   - '''Aggregate pushdown''' (`SupportsPushDownAggregates`,
  *     PARTIAL): COUNT/SUM/MIN/MAX — the reference's ComputeTotals
  *     shape (totals.go) — fold inside each walk partition, so a
  *     du-style per-tree total ships one row per (group, partition)
  *     instead of one row per file; Spark's final aggregate merges
  *     the partials, preserving exact SQL semantics (empty global
  *     partials emit the SQL one-row shape: count 0, null sum/min/max).
  *
  * Scan errors are not rows of this table — the library API
  * (`Walker.walk(...).errors`) carries them; a connector read is the
  * fact-table view.
  */
class WalkDataSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-walk"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WalkDataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new WalkTable(properties.asScala.toMap)
}

object WalkDataSource {
  val schema: StructType =
    org.apache.spark.sql.Encoders.product[FileEntry].schema

  /** Raw JVM value of one FileEntry field (strings unwrapped;
    * mod_time as epoch micros). */
  private[sources] def fieldOf(e: FileEntry, name: String): Any = name match {
    case "path" => e.path
    case "parent" => e.parent
    case "name" => e.name
    case "depth" => e.depth
    case "is_dir" => e.is_dir
    case "size" => e.size
    case "blocks" => e.blocks
    case "mode" => e.mode
    case "mod_time" => e.mod_time.getTime * 1000L +
      (e.mod_time.getNanos / 1000L) % 1000L
    case "uid" => e.uid
    case "gid" => e.gid
    case "device" => e.device
    case "inode" => e.inode
    case "nlink" => e.nlink
    case "n_entries" => e.n_entries
    case other => throw new IllegalArgumentException(s"unknown column $other")
  }

  private[sources] def toCatalyst(v: Any): Any = v match {
    case s: String => UTF8String.fromString(s)
    case other => other
  }

  /** FileEntry -> InternalRow projected to `required` (pruned). */
  private[sources] def toRow(e: FileEntry, required: StructType): InternalRow =
    InternalRow.fromSeq(
      required.fieldNames.toSeq.map(n => toCatalyst(fieldOf(e, n))))

  /** Numeric long of a field (Int fields upcast) — agg input. */
  private[sources] def longOf(e: FileEntry, name: String): Long =
    fieldOf(e, name) match {
      case i: Int => i.toLong
      case l: Long => l
      case other => throw new IllegalArgumentException(
        s"non-numeric agg column $name: $other")
    }

  // ---- pushed-aggregation model (serialized into the reader) ----
  sealed trait AggFun extends Serializable { def col: String }
  final case class CountStarF() extends AggFun { def col = "*" }
  final case class CountF(col: String) extends AggFun
  final case class SumF(col: String) extends AggFun
  final case class MinF(col: String) extends AggFun
  final case class MaxF(col: String) extends AggFun
  final case class PushedAgg(groupCols: Seq[String], funs: Seq[AggFun])
      extends Serializable

  // ---- pushed top-N model (serialized into the reader) ----
  final case class TopNKey(col: String, descending: Boolean)
      extends Serializable
  final case class PushedTopN(keys: Seq[TopNKey], limit: Int)
      extends Serializable

  /** Total order over entries for a pushed top-N — every FileEntry
    * field is non-null by construction, so null ordering never
    * applies. mod_time compares as epoch micros (fieldOf's rendering). */
  private[sources] def topNOrdering(keys: Seq[TopNKey]): Ordering[FileEntry] =
    new Ordering[FileEntry] {
      override def compare(a: FileEntry, b: FileEntry): Int = {
        keys.foreach { k =>
          val c = (fieldOf(a, k.col), fieldOf(b, k.col)) match {
            case (x: String, y: String) => x.compareTo(y)
            case (x: Boolean, y: Boolean) => java.lang.Boolean.compare(x, y)
            case (x: Int, y: Int) => java.lang.Integer.compare(x, y)
            case (x, y) => java.lang.Long.compare(
              x.asInstanceOf[Long], y.asInstanceOf[Long])
          }
          if (c != 0) return if (k.descending) -c else c
        }
        0
      }
    }

  private[sources] val numericFields = Set("depth", "size", "blocks",
    "mode", "uid", "gid", "device", "inode", "nlink", "n_entries")

  /** The scan's output schema under a pushed aggregation: group
    * columns first (source types), then one column per aggregate —
    * counts and sums widen to LONG (Spark's Sum/Count result types),
    * min/max keep the field's type. */
  private[sources] def aggSchema(p: PushedAgg): StructType = {
    val base = schema
    val g = p.groupCols.map(n => base(n))
    val a = p.funs.zipWithIndex.map {
      case (CountStarF(), i) =>
        org.apache.spark.sql.types.StructField(s"count_star_$i",
          org.apache.spark.sql.types.LongType, nullable = false)
      case (CountF(c), i) =>
        org.apache.spark.sql.types.StructField(s"count_${c}_$i",
          org.apache.spark.sql.types.LongType, nullable = false)
      case (SumF(c), i) =>
        org.apache.spark.sql.types.StructField(s"sum_${c}_$i",
          org.apache.spark.sql.types.LongType, nullable = true)
      case (MinF(c), i) =>
        org.apache.spark.sql.types.StructField(s"min_${c}_$i",
          base(c).dataType, nullable = true)
      case (MaxF(c), i) =>
        org.apache.spark.sql.types.StructField(s"max_${c}_$i",
          base(c).dataType, nullable = true)
    }
    StructType(g ++ a)
  }
}

final class WalkTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String =
    s"graft-walk(${props.getOrElse("root", "?")})"
  override def schema(): StructType = WalkDataSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WalkScanBuilder(
      options.getOrDefault("root", props.getOrElse("root", ".")),
      options.getOrDefault("seedDepth", props.getOrElse("seedDepth", "2")).toInt,
      options.getOrDefault("partitions", props.getOrElse("partitions", "8")).toInt,
      Option(options.get("exclusions")).orElse(props.get("exclusions"))
        .map(_.split(",").toSeq.filter(_.nonEmpty)).getOrElse(Nil))
}

final class WalkScanBuilder(root: String, seedDepth: Int, partitions: Int,
    exclusions: Seq[String])
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates
    with org.apache.spark.sql.connector.read.SupportsPushDownLimit
    with org.apache.spark.sql.connector.read.SupportsPushDownTopN {

  private var required: StructType = WalkDataSource.schema
  private var pushedPrefix: Option[String] = None
  private var pushedIsDir: Option[Boolean] = None
  private var impossible: Boolean = false
  private var pushed: Array[Filter] = Array.empty
  private var pushedAgg: Option[WalkDataSource.PushedAgg] = None
  private var pushedLimit: Option[Int] = None
  private var pushedTopN: Option[WalkDataSource.PushedTopN] = None

  /** PARTIAL limit pushdown: each walk partition stops statting after
    * `limit` surviving entries (the walker is lazy end-to-end, so a
    * `LIMIT 10` exploration touches ~10 inodes per partition instead
    * of the whole tree); Spark keeps its own global Limit above
    * (isPartiallyPushed).
    *
    * Limit and aggregate pushdown are MUTUALLY EXCLUSIVE in this
    * source: the reader applies a pushed limit to the entry stream
    * BEFORE a pushed aggregation would fold it, so co-pushing both
    * would silently aggregate a truncated stream. Catalyst's
    * V2ScanRelationPushDown ordering never pushes a limit through an
    * Aggregate today, but that is an invariant of Spark's rule order —
    * this builder enforces it locally: whichever arrives second is
    * declined, and `build()` asserts the invariant. */
  override def pushLimit(limit: Int): Boolean = {
    if (pushedAgg.isDefined || pushedTopN.isDefined) return false
    pushedLimit = Some(limit)
    true
  }
  override def isPartiallyPushed(): Boolean = true

  /** PARTIAL top-N pushdown (`SupportsPushDownTopN`) — the reference's
    * signature operator AT THE SOURCE (heap top-N, report_stats.go:
    * 71-82): each walk partition keeps a BOUNDED O(n) heap of the
    * `limit` smallest entries under the pushed sort order while the
    * lazy walker streams the subtree, so a `find … ORDER BY size DESC
    * LIMIT 10` ships 10 rows per partition instead of the whole tree;
    * Spark's global TakeOrderedAndProject merges the partials
    * (isPartiallyPushed). Composes with pushed filters — the heap sees
    * the post-filter stream. Declines anything but plain column sort
    * keys, and is mutually exclusive with a pushed limit or aggregate
    * (same invariant as pushLimit). Null ordering is irrelevant: every
    * field is non-null by construction. */
  override def pushTopN(orders: Array[org.apache.spark.sql.connector
      .expressions.SortOrder], limit: Int): Boolean = {
    import org.apache.spark.sql.connector.expressions.{NamedReference, SortDirection}
    if (pushedAgg.isDefined || pushedLimit.isDefined || limit <= 0)
      return false
    val keys = orders.toSeq.map { o =>
      o.expression() match {
        case nr: NamedReference if nr.fieldNames().length == 1 =>
          Some(WalkDataSource.TopNKey(nr.fieldNames()(0),
            o.direction() == SortDirection.DESCENDING))
        case _ => None
      }
    }
    if (keys.isEmpty || keys.exists(_.isEmpty)) return false
    if (!keys.flatten.forall(k =>
        WalkDataSource.schema.fieldNames.contains(k.col))) return false
    pushedTopN = Some(WalkDataSource.PushedTopN(keys.flatten, limit))
    true
  }

  /** PARTIAL aggregate pushdown (supportCompletePushDown stays
    * false): each walk partition ships one pre-aggregated row per
    * group instead of one row per file, and Spark's final aggregate
    * merges the partials — the "du at the source" path: totals never
    * materialize per-entry rows on the wire. COUNT/COUNT(col)
    * (all fields are non-null), SUM/MIN/MAX over the numeric fields,
    * GROUP BY any field except mod_time. Anything else declines and
    * Spark falls back to the row scan. */
  override def pushAggregation(agg: org.apache.spark.sql.connector
      .expressions.aggregate.Aggregation): Boolean = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    import org.apache.spark.sql.connector.expressions.aggregate._
    import WalkDataSource._
    def colOf(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case nr: NamedReference if nr.fieldNames().length == 1 =>
        Some(nr.fieldNames()(0))
      case _ => None
    }
    val groupable = WalkDataSource.schema.fieldNames.toSet - "mod_time"
    val g = agg.groupByExpressions.toSeq.map(colOf)
    if (g.exists(c => c.isEmpty || !groupable(c.get))) return false
    val funs: Seq[Option[AggFun]] = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some(CountStarF())
      case c: Count if !c.isDistinct => colOf(c.column).map(CountF)
      case m: Min => colOf(m.column).filter(numericFields).map(MinF)
      case m: Max => colOf(m.column).filter(numericFields).map(MaxF)
      case s: Sum if !s.isDistinct =>
        colOf(s.column).filter(numericFields).map(SumF)
      case _ => None
    }
    if (funs.isEmpty || funs.exists(_.isEmpty)) return false
    // see pushLimit/pushTopN: limit, topN and aggregate are exclusive
    if (pushedLimit.isDefined || pushedTopN.isDefined) return false
    pushedAgg = Some(PushedAgg(g.map(_.get), funs.map(_.get)))
    true
  }

  /** `is_dir = b` in all the shapes Catalyst ships it: `= true`
    * arrives as EqualTo after boolean simplification, `= false` as
    * `Not(EqualTo(is_dir, true))` (the optimizer rewrites to `NOT
    * is_dir` first). A shape left unconsumed would not just skip the
    * reader filter — a REMAINING filter blocks top-N and aggregate
    * pushdown entirely. */
  private def isDirEq(f: Filter): Option[Boolean] = f match {
    case EqualTo("is_dir", b: java.lang.Boolean) => Some(b.booleanValue())
    case org.apache.spark.sql.sources.Not(inner) => isDirEq(inner).map(!_)
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (take, remain) = filters.partition {
      case StringStartsWith("path", _) => true
      case f if isDirEq(f).isDefined => true
      // Every FileEntry field is non-null by construction, so the
      // isnotnull conjuncts Catalyst infers under comparisons are
      // trivially satisfied. Consuming them matters: aggregate and
      // top-N pushdown only engage when NO filter remains above the
      // scan.
      case org.apache.spark.sql.sources.IsNotNull(_) => true
      case _ => false
    }
    take.foreach {
      case StringStartsWith("path", p) =>
        // Two prefix filters compose to the more restrictive one when
        // nested; disjoint prefixes make the conjunction unsatisfiable —
        // recorded as an explicit flag (not an in-band magic string), so
        // the scan plans zero partitions.
        pushedPrefix = pushedPrefix match {
          case Some(q) if q.startsWith(p) => Some(q)
          case Some(q) if p.startsWith(q) => Some(p)
          case Some(q) => impossible = true; Some(q)
          case None => Some(p)
        }
      case f =>
        isDirEq(f).foreach { b =>
          // Contradictory conjuncts (is_dir=true AND is_dir=false) are
          // both consumed; the scan must then return nothing.
          pushedIsDir match {
            case Some(prev) if prev != b => impossible = true
            case _ => pushedIsDir = Some(b)
          }
        }
    }
    pushed = take
    remain
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    // An empty projection (count(*)) is honored: rows become empty
    // InternalRows — the scan still walks, but ships zero bytes/row.
    // Under a pushed aggregation the output schema is the aggregate's
    // (Spark re-prunes with that same schema — nothing to narrow).
    if (pushedAgg.isEmpty) required = requiredSchema

  override def build(): Scan = {
    require(Seq(pushedLimit, pushedAgg, pushedTopN).count(_.isDefined) <= 1,
      "walk source invariant: pushed limit / top-N / aggregation are " +
        "mutually exclusive (a limit or heap truncates the stream an " +
        "aggregate would fold)")
    new WalkScan(root, seedDepth, partitions, exclusions,
      pushedAgg.map(WalkDataSource.aggSchema).getOrElse(required),
      pushedPrefix, pushedIsDir, impossible, pushedAgg, pushedLimit,
      pushedTopN)
  }
}

final class WalkScan(root: String, seedDepth: Int, partitions: Int,
    exclusions: Seq[String], required: StructType,
    prefix: Option[String], isDir: Option[Boolean],
    impossible: Boolean,
    agg: Option[WalkDataSource.PushedAgg] = None,
    limit: Option[Int] = None,
    topN: Option[WalkDataSource.PushedTopN] = None) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-walk root=$root PushedFilters: [" +
      (prefix.map(p => s"StartsWith(path,$p)").toSeq ++
        isDir.map(b => s"EqualTo(is_dir,$b)").toSeq).mkString(", ") +
      "] " +
      agg.map(a => "PushedAggregates: [" +
        a.funs.map(f => s"${f.getClass.getSimpleName.stripSuffix("F")}(${f.col})")
          .mkString(", ") +
        s"] GroupBy: [${a.groupCols.mkString(", ")}] ").getOrElse("") +
      limit.map(l => s"PushedLimit: $l ").getOrElse("") +
      topN.map(t => "PushedTopN: [" +
        t.keys.map(k => s"${k.col} ${if (k.descending) "DESC" else "ASC"}")
          .mkString(", ") + s"] limit ${t.limit} ").getOrElse("") +
      s"ReadSchema: ${required.fieldNames.mkString(",")}"

  /** Planning = the walker's driver seeding; a pushed path prefix
    * prunes whole seed subtrees here (a seed survives iff its subtree
    * can intersect the prefix). Driver-level records ride partition 0. */
  override def planInputPartitions(): Array[InputPartition] = {
    if (impossible) return Array.empty
    val rootPath = java.nio.file.Paths.get(root).toAbsolutePath.normalize
    val (driverRecords, seeds) =
      Walker.driverSeed(rootPath, exclusions, seedDepth,
        Walker.PrevDirs.empty)
    val keptSeeds = prefix match {
      case Some(p) => seeds.filter(s => s.startsWith(p) || p.startsWith(s))
      case None => seeds
    }
    val driverEntries = driverRecords.flatMap(_.entry)
    val nParts = math.max(1, math.min(partitions, math.max(1, keptSeeds.size)))
    val groups = keptSeeds.zipWithIndex.groupMap(_._2 % nParts)(_._1)
    (0 until nParts).map { i =>
      WalkPartition(groups.getOrElse(i, Nil),
        if (i == 0) driverEntries else Nil, exclusions)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WalkReaderFactory(required, prefix, isDir, agg, limit, topN)
}

final case class WalkPartition(seeds: Seq[String],
    driverEntries: Seq[FileEntry], exclusions: Seq[String])
    extends InputPartition

final class WalkReaderFactory(required: StructType, prefix: Option[String],
    isDir: Option[Boolean],
    agg: Option[WalkDataSource.PushedAgg] = None,
    limit: Option[Int] = None,
    topN: Option[WalkDataSource.PushedTopN] = None)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[WalkPartition]
    val ex = part.exclusions.map(_.r)
    def entries: Iterator[FileEntry] = {
      val base =
        (part.driverEntries.iterator ++ part.seeds.iterator.flatMap { s =>
          Walker.walkSubtree(java.nio.file.Paths.get(s), ex,
            Walker.PrevDirs.empty).flatMap(_.entry)
        }).filter { e =>
          prefix.forall(e.path.startsWith) && isDir.forall(_ == e.is_dir)
        }
      // partial limit: the iterator chain is lazy end-to-end, so
      // take(n) stops the walk after n surviving entries
      limit.map(base.take).getOrElse(base)
    }
    /* Partial top-N: a bounded max-heap of the `limit` smallest entries
     * under the pushed order (head = current worst) drains the lazy
     * post-filter stream — O(limit) memory, O(n·log limit) time per
     * partition, and only `limit` rows reach the wire; Spark's global
     * TakeOrderedAndProject merges the partials. Ties past the heap
     * capacity keep the first-seen rows — any `limit`-subset of a tie
     * group is a correct partial (the global TopN breaks those ties
     * arbitrarily too). */
    def topNEntries(t: WalkDataSource.PushedTopN): Iterator[FileEntry] = {
      val ord = WalkDataSource.topNOrdering(t.keys)
      val heap = scala.collection.mutable.PriorityQueue.empty[FileEntry](ord)
      entries.foreach { e =>
        if (heap.size < t.limit) heap.enqueue(e)
        else if (ord.compare(e, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(e)
        }
      }
      heap.dequeueAll.reverseIterator // ascending under ord
    }
    /* Drain this partition's entries into per-group PARTIAL aggregate
     * rows (group values ++ agg values). SQL empty-input semantics
     * per partial: a global (ungrouped) aggregation always emits its
     * one row (count 0, sum/min/max null), so Spark's final merge
     * sees the same shape a one-row SQL aggregate would produce; an
     * absent GROUP simply emits nothing. */
    def aggregated(a: WalkDataSource.PushedAgg): Seq[InternalRow] = {
      import WalkDataSource._
      final class Acc {
        val value = Array.fill(a.funs.size)(0L)
        val seen = Array.fill(a.funs.size)(false)
      }
      val groups = scala.collection.mutable.LinkedHashMap.empty[Seq[Any], Acc]
      if (a.groupCols.isEmpty) groups(Nil) = new Acc
      entries.foreach { e =>
        val key = a.groupCols.map(c => fieldOf(e, c))
        val acc = groups.getOrElseUpdate(key, new Acc)
        var i = 0
        a.funs.foreach { f =>
          f match {
            case CountStarF() | CountF(_) => acc.value(i) += 1L
            case SumF(c) =>
              acc.value(i) += longOf(e, c); acc.seen(i) = true
            case MinF(c) =>
              val v = longOf(e, c)
              if (!acc.seen(i) || v < acc.value(i)) acc.value(i) = v
              acc.seen(i) = true
            case MaxF(c) =>
              val v = longOf(e, c)
              if (!acc.seen(i) || v > acc.value(i)) acc.value(i) = v
              acc.seen(i) = true
          }
          i += 1
        }
      }
      val intTyped = a.funs.map {
        case MinF(c) => WalkDataSource.schema(c).dataType ==
          org.apache.spark.sql.types.IntegerType
        case MaxF(c) => WalkDataSource.schema(c).dataType ==
          org.apache.spark.sql.types.IntegerType
        case _ => false
      }
      groups.iterator.map { case (key, acc) =>
        val aggVals: Seq[Any] = a.funs.zipWithIndex.map {
          case (CountStarF() | CountF(_), i) => acc.value(i)
          case (_, i) if !acc.seen(i) => null
          case (_, i) if intTyped(i) => acc.value(i).toInt
          case (_, i) => acc.value(i)
        }
        InternalRow.fromSeq(key.map(toCatalyst) ++ aggVals)
      }.toSeq
    }

    agg match {
      case None =>
        new PartitionReader[InternalRow] {
          private val it = topN.map(topNEntries).getOrElse(entries)
          private var cur: FileEntry = _
          override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }
          override def get(): InternalRow = WalkDataSource.toRow(cur, required)
          override def close(): Unit = ()
        }
      case Some(a) =>
        new PartitionReader[InternalRow] {
          private val it = aggregated(a).iterator
          private var cur: InternalRow = _
          override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }
          override def get(): InternalRow = cur
          override def close(): Unit = ()
        }
    }
  }
}

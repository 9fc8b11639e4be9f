package graft.sources

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ingest.Walker

/** The DataSource V2 façade must equal the library walk row-for-row,
  * prune subtrees under a pushed path prefix, and honor column
  * pruning. */
class WalkSourceSpec extends SparkSpec {

  private def buildTree(): Path = {
    val root = Files.createTempDirectory("graft-dsv2")
    def mk(dir: Path, level: Int): Unit = {
      for (i <- 0 until 3)
        Files.write(dir.resolve(s"f$level-$i"), ("x" * (i + 1)).getBytes)
      if (level < 3)
        for (i <- 0 until 2) {
          val d = dir.resolve(s"d$level-$i")
          Files.createDirectory(d)
          mk(d, level + 1)
        }
    }
    mk(root, 0)
    root
  }

  private def readSource(root: Path, opts: (String, String)*) = {
    val r = spark.read.format("graft-walk").option("root", root.toString)
    opts.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  test("source read equals Walker.walk entries row-for-row") {
    val root = buildTree()
    val viaSource = readSource(root)
      .select("path", "is_dir", "size", "nlink", "n_entries")
      .collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val viaLib = Walker.walk(spark, root.toString, seedDepth = 2)
      .entries.collect()
      .map(e => (e.path, e.is_dir, e.size, e.nlink, e.n_entries)).toSet
    assert(viaSource.nonEmpty && viaSource === viaLib)
  }

  test("path-prefix filter is pushed, prunes subtrees, and stays exact") {
    val root = buildTree()
    val prefix = s"$root/d0-0"
    val df = readSource(root).where(col("path").startsWith(prefix))
    // pushed into the scan: the v2 scan description carries it
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("StartsWith(path"), plan.take(800))
    val got = df.select("path").collect().map(_.getString(0)).toSet
    val exp = Walker.walk(spark, root.toString, seedDepth = 2)
      .entries.collect().map(_.path).filter(_.startsWith(prefix)).toSet
    assert(got === exp && got.nonEmpty)
    // disjoint prefixes compose to an always-false scan, not an error
    assert(df.where(col("path").startsWith(s"$root/d0-1")).count() === 0L)
  }

  test("column pruning reaches the reader; is_dir equality is pushed") {
    val root = buildTree()
    val df = readSource(root).where(col("is_dir") === true).select("path")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: path"), plan.take(800))
    assert(plan.contains("EqualTo(is_dir,true)"), plan.take(800))
    val nDirs = df.count()
    // depth-3 binary tree: 1 root + 2 + 4 + 8 dirs
    assert(nDirs === 15L)
    // empty projection (count(*)) works
    assert(readSource(root).count() ===
      Walker.walk(spark, root.toString, seedDepth = 2).entries.count())
  }

  test("contradictory pushed is_dir conjuncts plan an empty scan") {
    // Exercise the builder directly: Catalyst may fold the boolean
    // contradiction before it ever reaches pushFilters, but a v2
    // source must stay correct for ANY conjunct set it accepts.
    val root = buildTree()
    val b = new WalkScanBuilder(root.toString, 2, 8, Nil)
    val remaining = b.pushFilters(Array(
      org.apache.spark.sql.sources.EqualTo("is_dir", java.lang.Boolean.TRUE),
      org.apache.spark.sql.sources.EqualTo("is_dir", java.lang.Boolean.FALSE)))
    assert(remaining.isEmpty, "both conjuncts are consumed")
    assert(b.build().toBatch.planInputPartitions().isEmpty,
      "an unsatisfiable conjunction must plan zero partitions")
    // agreeing duplicates still scan
    val b2 = new WalkScanBuilder(root.toString, 2, 8, Nil)
    b2.pushFilters(Array(
      org.apache.spark.sql.sources.EqualTo("is_dir", java.lang.Boolean.TRUE),
      org.apache.spark.sql.sources.EqualTo("is_dir", java.lang.Boolean.TRUE)))
    assert(b2.build().toBatch.planInputPartitions().nonEmpty)
  }

  test("partitions option bounds planned input partitions") {
    val root = buildTree()
    val df = readSource(root, "partitions" -> "2", "seedDepth" -> "1")
    assert(df.rdd.getNumPartitions === 2)
  }

  test("aggregate pushdown: global totals fold inside the scan, exactly") {
    val root = buildTree()
    val df = readSource(root).agg(
      count(lit(1)).as("n"), sum(col("size")).as("bytes"),
      min(col("size")).as("lo"), max(col("size")).as("hi"),
      count(col("path")).as("np"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates"), plan.take(1200))
    val row = df.collect()(0)
    val lib = Walker.walk(spark, root.toString, seedDepth = 2)
      .entries.collect()
    assert(row.getLong(0) == lib.length.toLong)
    assert(row.getLong(1) == lib.map(_.size).sum)
    assert(row.getLong(2) == lib.map(_.size).min)
    assert(row.getLong(3) == lib.map(_.size).max)
    assert(row.getLong(4) == lib.length.toLong)
  }

  test("aggregate pushdown: grouped totals and filter+agg compose") {
    val root = buildTree()
    val grouped = readSource(root)
      .groupBy(col("is_dir"), col("depth"))
      .agg(count(lit(1)).as("n"), sum(col("size")).as("bytes"))
    assert(grouped.queryExecution.executedPlan.toString
      .contains("PushedAggregates"))
    val got = grouped.collect()
      .map(r => (r.getBoolean(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val lib = Walker.walk(spark, root.toString, seedDepth = 2)
      .entries.collect().groupBy(e => (e.is_dir, e.depth))
      .map { case (k, es) => k -> ((es.length.toLong, es.map(_.size).sum)) }
    assert(got == lib)
    // a pushed prefix filter composes with the pushed aggregate
    val prefix = s"$root/d0-0"
    val filtered = readSource(root)
      .where(col("path").startsWith(prefix))
      .agg(count(lit(1)).as("n"))
    val fplan = filtered.queryExecution.executedPlan.toString
    assert(fplan.contains("PushedAggregates") &&
      fplan.contains("StartsWith(path"))
    val expUnderPrefix = Walker.walk(spark, root.toString, seedDepth = 2)
      .entries.collect().count(_.path.startsWith(prefix)).toLong
    assert(filtered.collect()(0).getLong(0) == expUnderPrefix)
  }

  test("limit pushdown: partial per-partition take, exact global result") {
    val root = buildTree()
    val df = readSource(root).limit(5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedLimit: 5"), plan.take(900))
    val got = df.select("path").collect().map(_.getString(0))
    assert(got.length == 5 && got.distinct.length == 5)
    val all = Walker.walk(spark, root.toString, seedDepth = 2)
      .entries.collect().map(_.path).toSet
    assert(got.forall(all)) // real entries, Spark's global Limit on top
    // limit composes with a pushed filter
    val lf = readSource(root)
      .where(col("is_dir") === true).limit(3)
    assert(lf.queryExecution.executedPlan.toString.contains("PushedLimit: 3"))
    val dirs = lf.collect()
    assert(dirs.length == 3 && dirs.forall(_.getAs[Boolean]("is_dir")))
  }

  test("topN pushdown: plan-visible, equals row-scan truth, composes with filters") {
    val root = buildTree()
    // unique total order (size DESC, path ASC): exact comparison
    val df = readSource(root)
      .orderBy(col("size").desc, col("path").asc).limit(7)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedTopN: [size DESC, path ASC] limit 7"),
      plan.take(1200))
    val got = df.select("path", "size").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val lib = Walker.walk(spark, root.toString, seedDepth = 2)
      .entries.collect().map(e => (e.path, e.size))
      .sortBy { case (p, s) => (-s, p) }.take(7).toSeq
    assert(got == lib)
    // composes with a pushed filter: the heap sees the post-filter
    // stream, and both push marks appear in one scan description
    val prefix = s"$root/d0-0"
    val filtered = readSource(root)
      .where(col("path").startsWith(prefix) && col("is_dir") === false)
      .orderBy(col("size").desc, col("path").asc).limit(4)
    val fplan = filtered.queryExecution.executedPlan.toString
    assert(fplan.contains("PushedTopN") && fplan.contains("StartsWith(path"),
      fplan.take(1200))
    val fgot = filtered.select("path", "size").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val flib = Walker.walk(spark, root.toString, seedDepth = 2)
      .entries.collect()
      .filter(e => e.path.startsWith(prefix) && !e.is_dir)
      .map(e => (e.path, e.size)).sortBy { case (p, s) => (-s, p) }
      .take(4).toSeq
    assert(fgot == flib && fgot.nonEmpty)
  }

  test("topN pushdown: ties past heap capacity stay correct on the sort key") {
    val root = buildTree()
    // size alone is massively tied (sizes are 1..3 bytes): any
    // limit-subset of the boundary tie group is a correct answer, so
    // compare the returned KEY multiset, not row identity
    val df = readSource(root).where(col("is_dir") === false)
      .orderBy(col("size").desc).limit(10)
    assert(df.queryExecution.executedPlan.toString
      .contains("PushedTopN: [size DESC] limit 10"))
    val got = df.select("size").collect().map(_.getLong(0)).toSeq.sorted
    val want = Walker.walk(spark, root.toString, seedDepth = 2)
      .entries.collect().filter(!_.is_dir).map(_.size)
      .sorted(Ordering[Long].reverse).take(10).sorted.toSeq
    assert(got == want)
    // mod_time sorts compare as epoch micros — smoke the non-long field
    val byTime = readSource(root).orderBy(col("mod_time").asc).limit(3)
    assert(byTime.queryExecution.executedPlan.toString
      .contains("PushedTopN: [mod_time ASC] limit 3"))
    assert(byTime.collect().length == 3)
  }

  test("aggregate pushdown declines distinct and avg gracefully") {
    val root = buildTree()
    // count distinct is not pushable — the plan must NOT claim a
    // pushed aggregate and the answer must still be exact
    val d = readSource(root).agg(countDistinct(col("parent")).as("nd"))
    assert(!d.queryExecution.executedPlan.toString
      .contains("PushedAggregates"))
    val lib = Walker.walk(spark, root.toString, seedDepth = 2)
      .entries.collect()
    assert(d.collect()(0).getLong(0) == lib.map(_.parent).distinct.length.toLong)
    // empty-result regime: an impossible pushed filter under a global
    // agg still yields the SQL one-row shape (count 0, null sum)
    val empty = readSource(root)
      .where(col("path").startsWith(s"$root/nonexistent"))
      .agg(count(lit(1)).as("n"), sum(col("size")).as("s"))
      .collect()(0)
    assert(empty.getLong(0) == 0L && empty.isNullAt(1))
  }
}

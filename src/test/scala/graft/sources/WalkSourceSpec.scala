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
}

package graft.plans

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

import graft.SparkSpec

class IntervalSweepJoinSpec extends SparkSpec {

  import spark.implicits._

  private def hasSweepExec(p: SparkPlan): Boolean = p match {
    case a: AdaptiveSparkPlanExec => hasSweepExec(a.executedPlan)
    case _: IntervalSweepJoinExec => true
    case other => other.children.exists(hasSweepExec) ||
      other.subqueries.exists(hasSweepExec)
  }

  /** The declarative reference: plain inequality join with the exact
    * strict-overlap predicate. */
  private def reference(l: DataFrame, r: DataFrame) =
    l.join(r, l("k") === r("k") && l("ls") < r("re") && r("rs") < l("le"))
      .select(l("k"), l("lid"), l("ls"), l("le"),
        r("rs").as("iv_start"), r("re").as("iv_end"), r("rid").as("iv_rid"))

  private def viaExec(l: DataFrame, r: DataFrame) =
    IntervalSweepJoin.overlap(l, r, Seq("k"), "ls", "le", "rs", "re",
      Seq("rid"))

  private def sorted(df: DataFrame) =
    df.select("k", "lid", "ls", "le", "iv_start", "iv_end", "iv_rid")
      .collect().map(_.toSeq).sortBy(_.toString()).toSeq

  test("handcrafted semantics: strict overlap, touching excluded") {
    val l = Seq((1L, 1L, 0L, 10L), (1L, 2L, 10L, 20L), (2L, 3L, 0L, 5L))
      .toDF("k", "lid", "ls", "le")
    val r = Seq((1L, 7L, 5L, 12L), (1L, 8L, 20L, 30L), (3L, 9L, 0L, 100L))
      .toDF("k", "rid", "rs", "re")
    val got = viaExec(l, r)
      .select("lid", "iv_rid").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSeq.sorted
    // (1,7): [0,10)x[5,12) overlap; (2,7): [10,20)x[5,12) overlap;
    // (2,8): touching at 20 -> excluded; key 2 and key 3 never pair.
    assert(got == Seq((1L, 7L), (2L, 7L)))
  }

  test("plans through IntervalSweepJoinExec; equals inequality join on random data") {
    val rnd = new Random(23)
    def mk(n: Int, keyCard: Int) = (0 until n).map { i =>
      val s = rnd.nextInt(1000).toLong
      (rnd.nextInt(keyCard).toLong, i.toLong, s,
        s + rnd.nextInt(40).toLong) // includes EMPTY intervals (len 0)
    }
    val l = mk(400, 12).toDF("k", "lid", "ls", "le")
    val r = mk(300, 12).toDF("k", "rid", "rs", "re")
    val exec = viaExec(l, r)
    assert(hasSweepExec(exec.queryExecution.executedPlan),
      exec.queryExecution.executedPlan.toString)
    assert(sorted(exec) == sorted(reference(l, r)))
  }

  test("duplicate intervals multiply; identical starts pair both ways") {
    val l = Seq((1L, 1L, 0L, 10L), (1L, 2L, 0L, 10L))
      .toDF("k", "lid", "ls", "le")
    val r = Seq((1L, 7L, 0L, 10L), (1L, 8L, 0L, 10L))
      .toDF("k", "rid", "rs", "re")
    assert(viaExec(l, r).count() === 4L) // full cross of the dup group
    assert(sorted(viaExec(l, r)) == sorted(reference(l, r)))
  }

  test("self-join from one scan (DeduplicateRelations re-aliasing)") {
    val base = (0 until 200).map { i =>
      val s = (i * 13 % 500).toLong
      (i.toLong % 8, i.toLong, s, s + 30L)
    }.toDF("k", "id", "s", "e")
    val l = base.where(col("id") % 2 === 0)
      .select(col("k"), col("id").as("lid"), col("s").as("ls"),
        col("e").as("le"))
    val r = base.where(col("id") % 2 === 1)
      .select(col("k"), col("id").as("rid"), col("s").as("rs"),
        col("e").as("re"))
    assert(sorted(viaExec(l, r)) == sorted(reference(l, r)))
  }

  test("property sweep: parity across overlap regimes") {
    // regime axes: key cardinality (1 = everything collides, 50 =
    // sparse), interval length (0 = all empty, 500 = near-total
    // overlap), and side sizes — each seeded config must match the
    // reference join row-for-row.
    val regimes = Seq(
      (1, 1, 60, 40, 30),   // one key, short intervals
      (2, 50, 60, 40, 30),  // many keys, short
      (3, 4, 500, 80, 80),  // dense: near-total overlap within key
      (4, 8, 0, 50, 50),    // all empty intervals
      (5, 6, 15, 1, 120),   // single left row
      (6, 6, 15, 120, 1))   // single right row
    for ((seed, keys, len, nl, nr) <- regimes) {
      val rnd = new Random(seed)
      def mk(n: Int) = (0 until n).map { i =>
        val s = rnd.nextInt(600).toLong
        (rnd.nextInt(keys).toLong, i.toLong, s,
          s + (if (len == 0) 0L else rnd.nextInt(len).toLong))
      }
      val l = mk(nl).toDF("k", "lid", "ls", "le")
      val r = mk(nr).toDF("k", "rid", "rs", "re")
      assert(sorted(viaExec(l, r)) == sorted(reference(l, r)),
        s"regime seed=$seed keys=$keys len=$len")
    }
  }

  test("timestamp-typed bounds work end to end") {
    val l = Seq((1L, 1L, "2024-01-01 00:00:00", "2024-01-10 00:00:00"))
      .toDF("k", "lid", "a", "b")
      .select(col("k"), col("lid"), to_timestamp(col("a")).as("ls"),
        to_timestamp(col("b")).as("le"))
    val r = Seq((1L, 7L, "2024-01-05 00:00:00", "2024-01-20 00:00:00"),
        (1L, 8L, "2024-01-10 00:00:00", "2024-01-20 00:00:00"))
      .toDF("k", "rid", "a", "b")
      .select(col("k"), col("rid"), to_timestamp(col("a")).as("rs"),
        to_timestamp(col("b")).as("re"))
    val got = viaExec(l, r).select("iv_rid").collect().map(_.getLong(0))
    assert(got.toSeq == Seq(7L)) // touching at 01-10 excluded
  }
}

package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HeavyHittersSpec extends SparkSpec {

  /** Zipf-ish stream: item i (1-based) appears floor(6000/i) times →
    * 30 distinct items, heavily skewed, n ≈ 23,000. */
  private lazy val zipf = {
    val s = spark
    import s.implicits._
    (1 to 30).flatMap(i => Seq.fill(6000 / i)(s"item$i"))
      .toDF("item").repartition(8) // force multi-partition merges
  }

  test("capacity above cardinality: sketch is exact with zero error") {
    val exact = zipf.groupBy("item").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = HeavyHitters.topK(zipf, "item", capacity = 64, k = 30).collect()
    assert(got.length == 30)
    got.foreach { r =>
      assert(r.getLong(1) == exact(r.getString(0)))
      assert(r.getLong(2) == 0L)
    }
  }

  test("under eviction pressure: true heavies present, bounds hold") {
    val n = zipf.count()
    val capacity = 8
    val exact = zipf.groupBy("item").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = HeavyHitters.topK(zipf, "item", capacity, k = capacity)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // every item with true frequency > n/capacity must be present
    val mustHave = exact.filter(_._2 > n / capacity).keySet
    assert(mustHave.subsetOf(got.map(_._1).toSet),
      s"missing heavies: ${mustHave -- got.map(_._1).toSet}")
    got.foreach { case (item, est, err) =>
      val t = exact(item)
      assert(est >= t, s"$item undercounted: $est < $t") // never undercounts
      assert(est - err <= t, s"$item lower bound broken: $est - $err > $t")
    }
  }

  test("deterministic across runs in the no-eviction regime") {
    // under eviction pressure estimates depend on (nondeterministic)
    // partition merge order — inherent to the sketch; with capacity ≥
    // cardinality every run is bit-identical
    val a = HeavyHitters.topK(zipf, "item", 64, 10).collect().toSeq
    val b = HeavyHitters.topK(zipf, "item", 64, 10).collect().toSeq
    assert(a.map(_.toString) == b.map(_.toString))
  }
}

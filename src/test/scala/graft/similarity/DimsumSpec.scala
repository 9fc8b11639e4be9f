package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DimsumSpec extends SparkSpec {

  private def rcDF(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("r", "c")
  }

  /** exact binary cosine per (a, b) pair, floored to e4 like the op */
  private def exact(rows: Seq[(Long, String)]): Map[(String, String), Long] = {
    val dist = rows.distinct
    val n = dist.groupBy(_._2).map { case (c, xs) => c -> xs.size.toLong }
    dist.groupBy(_._1).values.flatMap { in =>
      val cs = in.map(_._2).distinct.sorted
      for (i <- cs.indices; j <- i + 1 until cs.size) yield (cs(i), cs(j))
    }.groupBy(identity).map { case (p @ (a, b), xs) =>
      p -> math.floor(xs.size * 10000.0 /
        (math.sqrt(n(a).toDouble) * math.sqrt(n(b).toDouble))).toLong
    }
  }

  private def randomRows(seed: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    (0L until 300L).flatMap { r =>
      Seq.fill(2 + rnd.nextInt(4))(s"c${rnd.nextInt(25)}").map(r -> _)
    }
  }

  test("gamma large enough: every pair survives with p=1 and est is exact") {
    val rows = randomRows(3)
    val got = Dimsum.pairs(rcDF(rows), "r", "c", gamma = 1e6)
      .collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getAs[Long]("est_cos_e4"))
      .toMap
    assert(got == exact(rows))
  }

  test("deterministic: the sampled estimate is identical run to run") {
    val rows = randomRows(9)
    def run() = Dimsum.pairs(rcDF(rows), "r", "c", gamma = 3.0)
      .collect()
      .map(x => (x.getString(0), x.getString(1), x.getAs[Long]("n_sampled"),
        x.getAs[Long]("est_cos_e4"))).toSet
    assert(run() == run())
  }

  test("two-sided: gamma large enough keeps every entry and est is exact") {
    val rows = randomRows(5)
    val got = Dimsum.pairsTwoSided(rcDF(rows), "r", "c", gamma = 1e6)
      .collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getAs[Long]("est_cos_e4"))
      .toMap
    assert(got == exact(rows))
  }

  test("two-sided: deterministic and built from a genuinely thinned matrix") {
    val rows = randomRows(11)
    def run() = Dimsum.pairsTwoSided(rcDF(rows), "r", "c", gamma = 4.0)
      .collect()
      .map(x => (x.getString(0), x.getString(1), x.getAs[Long]("n_sampled"),
        x.getAs[Long]("est_cos_e4"))).toSet
    val a = run()
    assert(a == run())
    // thinning is real: strictly fewer surviving pair observations
    // than the exact co-occurrence total
    val exactTotal = {
      val dist = rows.distinct
      dist.groupBy(_._1).values.map { in =>
        val k = in.map(_._2).distinct.size; k.toLong * (k - 1) / 2
      }.sum
    }
    assert(a.toSeq.map(_._3).sum < exactTotal)
  }

  test("two-sided: hot twin columns estimate tracks cos=1") {
    val rnd = new scala.util.Random(29)
    val hot = (0L until 200L).flatMap(r => Seq(r -> "h1", r -> "h2"))
    val bg = (0L until 200L).flatMap { r =>
      Seq.fill(3)(s"b${rnd.nextInt(30)}").map(r -> _)
    }
    val rows = hot ++ bg
    // sqrt(gamma)=8 -> p_h = 8/sqrt(200) ~ 0.57 per entry, q ~ 0.32
    val est = Dimsum.pairsTwoSided(rcDF(rows), "r", "c", gamma = 64.0)
      .where(col("a") === "h1" && col("b") === "h2")
      .collect()
    assert(est.length == 1, "the hot pair must survive at gamma=64")
    val e = est.head.getAs[Long]("est_cos_e4")
    // entry-coin reuse raises variance vs the pair-coined form — allow
    // a wider band than the pairs() test, still clearly "high cosine"
    assert(math.abs(e - 10000L) < 4000L, s"est_cos_e4 $e far from 10000")
    assert(est.head.getAs[Long]("n_sampled") < 150L,
      "entry sampling did not thin the hot pair")
  }

  test("planted hot twin columns: sampled estimate tracks cos=1") {
    val rnd = new scala.util.Random(17)
    // h1,h2 co-occur in 200 rows (cos = 1, heavy norms -> p < 1);
    // background columns add wedges without touching h1/h2 counts
    val hot = (0L until 200L).flatMap(r => Seq(r -> "h1", r -> "h2"))
    val bg = (0L until 200L).flatMap { r =>
      Seq.fill(3)(s"b${rnd.nextInt(30)}").map(r -> _)
    }
    val rows = hot ++ bg
    val est = Dimsum.pairs(rcDF(rows), "r", "c", gamma = 30.0)
      .where(col("a") === "h1" && col("b") === "h2")
      .collect()
    assert(est.length == 1, "the hot pair must be sampled at gamma=30")
    val e = est.head.getAs[Long]("est_cos_e4")
    // p = 30/200 -> ~30 expected samples; estimator unbiased, so the
    // deterministic draw should land well within 30% of 10000
    assert(math.abs(e - 10000L) < 3000L, s"est_cos_e4 $e far from 10000")
    // and the sampled count is far below the exact co-occurrence count
    assert(est.head.getAs[Long]("n_sampled") < 100L,
      "sampling did not actually thin the hot pair")
  }
}

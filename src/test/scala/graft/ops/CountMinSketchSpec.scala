package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CountMinSketchSpec extends SparkSpec {
  import spark.implicits._

  // Zipf-ish multiset: item i appears ~1000/i times, i in 1..200.
  private val rows: Seq[(String, String)] = for {
    i <- 1 to 200
    _ <- 1 to (1000 / i)
  } yield (if (i % 2 == 0) "even" else "odd", s"item$i")

  private val truth: Map[String, Long] =
    rows.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }

  test("estimates are one-sided: never below truth, within eN above") {
    val sk = CountMinSketch.sketches(rows.toDF("g", "item"), Nil, "item",
      d = 5, w = 1024)
    val probes = (1 to 200 by 7).map(i => s"item$i") :+ "never-seen"
    val out = CountMinSketch.rollup(sk, Nil, probes).collect().head
    val n = rows.size.toLong
    val epsN = math.ceil(math.E / 1024 * n).toLong // classic CMS bound
    probes.zipWithIndex.foreach { case (p, i) =>
      val est = out.getLong(out.fieldIndex(s"est_${i + 1}"))
      val t = truth.getOrElse(p, 0L)
      assert(est >= t, s"$p: est $est below truth $t")
      assert(est <= t + epsN, s"$p: est $est exceeds truth $t + εN $epsN")
    }
  }

  test("merge of group sketches equals the single global sketch exactly") {
    val df = rows.toDF("g", "item")
    val perGroup = CountMinSketch.sketches(df, Seq("g"), "item")
    val probes = Seq("item1", "item3", "item10", "item100")
    val merged = CountMinSketch.rollup(perGroup, Nil, probes)
      .collect().head
    val global = CountMinSketch.rollup(
      CountMinSketch.sketches(df, Nil, "item"), Nil, probes)
      .collect().head
    probes.indices.foreach { i =>
      assert(merged.getLong(merged.fieldIndex(s"est_${i + 1}")) ===
        global.getLong(global.fieldIndex(s"est_${i + 1}")),
        s"probe $i: counter-sum merge must be exact")
    }
  }

  test("bit-identical across partitionings (integer counters commute)") {
    val df = rows.toDF("g", "item")
    def counters(parts: Int): Seq[Long] =
      CountMinSketch.sketches(df.repartition(parts), Nil, "item")
        .select(col("cms.counters")).collect().head.getSeq[Long](0)
    assert(counters(1) === counters(13))
  }

  test("driver-side sketch matches the distributed aggregate") {
    val local = rows.foldLeft(new CountMinSketch.Sketch(5, 2048)) {
      case (s, (_, item)) => s.add(item)
    }
    val dist = CountMinSketch.fromData(
      CountMinSketch.sketches(rows.toDF("g", "item"), Nil, "item")
        .select(col("cms.d"), col("cms.w"), col("cms.n"), col("cms.counters"))
        .collect().map(r => CountMinSketch.CmsData(r.getInt(0), r.getInt(1),
          r.getLong(2), r.getSeq[Long](3))).head)
    Seq("item1", "item7", "item50", "ghost").foreach { p =>
      assert(dist.estimate(p) === local.estimate(p))
    }
    assert(dist.n === rows.size.toLong)
  }

  test("inner product is one-sided and exact without cross collisions") {
    def sketchOf(items: Seq[String], w: Int = 4096): CountMinSketch.Sketch =
      items.foldLeft(new CountMinSketch.Sketch(5, w))((s, i) => s.add(i))
    // true join size of two multisets = Σ cA(k)·cB(k)
    def trueJoin(a: Seq[String], b: Seq[String]): Long = {
      val cb = b.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      a.groupBy(identity).map { case (k, v) =>
        v.size.toLong * cb.getOrElse(k, 0L)
      }.sum
    }
    val rnd = new scala.util.Random(5)
    (0 until 20).foreach { _ =>
      val a = Seq.fill(200)(s"k${rnd.nextInt(40)}")
      val b = Seq.fill(300)(s"k${rnd.nextInt(60)}")
      val est = CountMinSketch.innerProduct(sketchOf(a), sketchOf(b))
      val t = trueJoin(a, b)
      assert(est >= t, s"inner product below truth: $est < $t")
      // e/w · nA · nB Markov bound, d=5 rows: overwhelmingly inside
      assert(est <= t + math.ceil(math.E / 4096 * 200 * 300).toLong)
    }
    // 40+60 distinct keys in w=65536: collision-free w.h.p. -> exact
    val a = Seq.fill(500)(s"k${rnd.nextInt(40)}")
    val b = Seq.fill(500)(s"k${rnd.nextInt(60)}")
    assert(CountMinSketch.innerProduct(sketchOf(a, 65536), sketchOf(b, 65536))
      === trueJoin(a, b))
    // disjoint key spaces: zero unless a row collides
    val est0 = CountMinSketch.innerProduct(
      sketchOf(Seq.fill(100)("left"), 65536),
      sketchOf(Seq.fill(100)("right"), 65536))
    assert(est0 === 0L)
  }

  test("heavy items separate from the tail at practical widths") {
    val sk = rows.foldLeft(new CountMinSketch.Sketch(5, 2048)) {
      case (s, (_, item)) => s.add(item)
    }
    // item1 truth 1000, item200 truth 5: estimates must preserve the
    // order at w=2048 (εN ≈ 10 on ~7k items)
    assert(sk.estimate("item1") > 10 * sk.estimate("item200"))
  }
}

package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CoverageSpec extends SparkSpec {

  private def docsDF(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  /** Reference greedy over ALL docs (no sampling), same tie rule. */
  private def brute(rows: Seq[(Long, String)], k: Int): Seq[(Long, Long)] = {
    val sets = rows.map { case (id, t) =>
      id -> t.trim.toLowerCase.split("\\s+").distinct.toSet
    }
    val covered = scala.collection.mutable.Set.empty[String]
    val taken = scala.collection.mutable.Set.empty[Long]
    (1 to k).map { _ =>
      val (id, ts, g) = sets.filterNot(s => taken(s._1))
        .map { case (id, ts) => (id, ts, ts.count(!covered(_)).toLong) }
        .reduceLeft((a, b) =>
          if (b._3 > a._3 || (b._3 == a._3 && b._1 < a._1)) b else a)
      taken += id; covered ++= ts
      (id, g)
    }
  }

  test("greedy matches the brute-force replay when candidates cover all") {
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 40).map(i => s"w$i")
    val rows = (0L until 30L).map { id =>
      val n = 3 + rnd.nextInt(8)
      id -> Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val picks = Coverage.greedySelect(docsDF(rows), "text", "doc_id",
      candidates = 30, k = 4)
    assert(picks.map(p => (p.docId, p.gain)) == brute(rows, 4))
    // covered is cumulative and consistent with the gains
    assert(picks.map(_.covered) ==
      picks.scanLeft(0L)((acc, p) => acc + p.gain).tail)
  }

  test("tie on gain breaks by smaller doc id; gains are non-increasing") {
    val rows = Seq(
      (5L, "a b c"), (2L, "x y z"), // tied 3-token docs: 2 first
      (9L, "a b"), (1L, "a"))
    val picks = Coverage.greedySelect(docsDF(rows), "text", "doc_id",
      candidates = 10, k = 3)
    // after {2, 5} everything is covered; the residual gain-0 tie
    // again breaks by the smaller id (1, not 9)
    assert(picks.map(_.docId) == Seq(2L, 5L, 1L))
    assert(picks.map(_.gain) == Seq(3L, 3L, 0L))
    val gains = picks.map(_.gain)
    assert(gains.zip(gains.tail).forall { case (a, b) => a >= b },
      "greedy marginal gains must be non-increasing (submodularity)")
  }

  test("k beyond the candidate count stops at the candidates (no throw)") {
    val rows = Seq((3L, "a b"), (1L, "c"))
    val picks = Coverage.greedySelect(docsDF(rows), "text", "doc_id",
      candidates = 10, k = 5)
    assert(picks.map(_.docId) == Seq(3L, 1L))
    assert(picks.map(_.step) == Seq(1, 2))
  }

  test("coverageReport: corpus coverage is cumulative and caps at vocab") {
    val rows = (0L until 20L).map(id => id -> s"t$id shared common")
    val rep = Coverage.coverageReport(docsDF(rows), "text", "doc_id",
      candidates = 20, k = 3).collect()
    assert(rep.length == 3)
    val cov = rep.map(_.getAs[Long]("corpus_covered"))
    assert(cov.zip(cov.tail).forall { case (a, b) => a <= b })
    val vt = rep.head.getAs[Long]("vocab_total")
    assert(vt == 22L) // 20 unique + shared + common
    assert(cov.last <= vt)
    assert(rep.last.getAs[Long]("cover_bp") == cov.last * 10000L / vt)
  }
}

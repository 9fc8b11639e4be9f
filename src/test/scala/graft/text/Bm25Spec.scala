package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class Bm25Spec extends SparkSpec {

  import spark.implicits._

  /** Exact local BM25 twin: whitespace tokens, Lucene idf on the
    * µ-nat grid, the same all-integer floor-division contribution. */
  private def localScores(corpus: Seq[(Long, String)], terms: Seq[String])
      : Map[Long, (Long, Long, Long)] = {
    val toks = corpus.map { case (id, t) =>
      id -> t.trim.toLowerCase.split("\\s+", -1).toSeq
    }
    val n = toks.size.toLong
    val bigT = toks.map(_._2.size.toLong).sum
    val dfs = terms.map(t => toks.count(_._2.contains(t)).toLong)
    val idfMu = dfs.map(df =>
      math.floor(math.log(2.0 * (n + 1) / (2 * df + 1)) * 1e6 + 0.5).toLong)
    toks.map { case (id, ws) =>
      val dl = ws.size.toLong
      val tfs = terms.map(t => ws.count(_ == t).toLong)
      val nMatch = tfs.count(_ > 0).toLong
      val score = tfs.zip(idfMu).map { case (tf, idf) =>
        if (tf == 0) 0L
        else (idf * 44L * tf * bigT) / (20L * tf * bigT + 6L * bigT + 18L * dl * n)
      }.sum
      id -> ((dl, nMatch, score))
    }.toMap
  }

  private val corpus = Seq(
    1L -> "spark join hash join merge join speed",
    2L -> "stream stream window state",
    3L -> "join",
    4L -> "vector index probe vector",
    5L -> "nothing relevant here at all",
    6L -> "join vector join vector join vector")
  private val terms = Seq("join", "vector")

  test("distributed BM25 equals exact local recomputation") {
    val df = corpus.toDF("doc_id", "text")
    val got = Bm25.search(df, "text", "doc_id", terms, k = 10)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val want = localScores(corpus, terms).filter(_._2._2 > 0)
    assert(got == want)
  }

  test("ranking: more matched terms and higher tf rank higher; k bounds output") {
    val df = corpus.toDF("doc_id", "text")
    val ranked = Bm25.search(df, "text", "doc_id", terms, k = 3)
      .collect().map(_.getLong(0)).toSeq
    // doc 6 saturates both terms; docs 1/4 repeat one term each.
    assert(ranked.size == 3)
    assert(ranked.head == 6L)
    assert(!ranked.contains(5L))
  }

  test("deterministic across runs") {
    val df = corpus.toDF("doc_id", "text")
    val a = Bm25.search(df, "text", "doc_id", terms, k = 10).collect().toSeq
    val b = Bm25.search(df, "text", "doc_id", terms, k = 10).collect().toSeq
    assert(a == b)
  }
}

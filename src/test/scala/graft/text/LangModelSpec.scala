package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-computed bigram LM scores on a corpus small enough to verify
  * every count by eye. */
class LangModelSpec extends SparkSpec {

  private lazy val corpus = {
    val s = spark
    import s.implicits._
    Seq(
      0L -> "a b a b", // bigrams: ab, ba, ab
      1L -> "a b c",   // bigrams: ab, bc
      2L -> "c c",     // bigram:  cc
      3L -> "x"        // no bigram — must drop
    ).toDF("doc_id", "text")
  }

  test("bigram occurrences explode with prev token") {
    val occ = LangModel.bigramOccurrences(corpus, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // corpus-wide: ab×3, ba×1, bc×1, cc×1; doc 3 absent
    assert(occ.length == 6)
    assert(occ.count(_._2 == "a b") == 3)
    assert(!occ.exists(_._1 == 3L))
    assert(occ.filter(_._2 == "a b").forall(_._3 == "a"))
  }

  test("per-doc mean transition probability matches hand computation") {
    // c(bigram): ab=3 ba=1 bc=1 cc=1
    // c(prev·):  a=3  b=2  c=1
    // p: ab=3/3=1.0, ba=1/2=0.5, bc=1/2=0.5, cc=1/1=1.0
    // doc0 avg(1, .5, 1)=0.8333; doc1 avg(1, .5)=0.75; doc2 avg(1)=1.0
    val res = LangModel.bigramDocScore(corpus, "text", "doc_id")
      .orderBy(asc("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(res.toSeq == Seq((0L, 3L, 0.8333), (1L, 2L, 0.75), (2L, 1L, 1.0)))
  }

  test("low-likelihood gate keeps only corpus outliers") {
    val low = LangModel.lowLikelihoodDocs(corpus, "text", "doc_id", 0.8)
      .collect().map(_.getLong(0)).toSet
    assert(low == Set(1L))
  }
}

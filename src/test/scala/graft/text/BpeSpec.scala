package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{BpeExprs, BpeKernels}

/** BPE: hand-computed merge order on a toy corpus, train/apply
  * consistency, and kernel-vs-driver agreement. */
class BpeSpec extends SparkSpec {

  test("merge order on a toy corpus matches the hand computation") {
    val s = spark
    import s.implicits._
    // one word type "aaab" × 3: pair counts "a a"=6, "a b"=3
    // merge 1: "a a"  → [aa, a, b]; counts "aa a"=3, "a b"=3 → tie,
    // merge 2: "a b" (lexicographically smaller) → [aa, ab]
    // merge 3: "aa ab" → [aaab]
    val df = Seq((0L, "aaab aaab"), (1L, "aaab")).toDF("doc_id", "text")
    val merges = Bpe.train(df, "text", "doc_id", nMerges = 10)
    assert(merges == Seq("a a", "a b", "aa ab"))
  }

  test("encodeWord applies lowest-rank-first and counts shrink with merges") {
    val ranks3 = BpeKernels.prepare(Seq("a a", "a b", "aa ab"))
    assert(BpeKernels.encodeWord("aaab", ranks3).toSeq == Seq("aaab"))
    val ranks1 = BpeKernels.prepare(Seq("a a"))
    assert(BpeKernels.encodeWord("aaab", ranks1).toSeq == Seq("aa", "a", "b"))
    assert(BpeKernels.encodeWord("aaab", BpeKernels.prepare(Nil)).length == 4)
  }

  test("distributed kernel equals driver-side tokenization on fuzz text") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(5)
    val alpha = "abcd"
    val docs = (0 until 60).map { i =>
      i.toLong -> (0 until 12).map(_ =>
        (0 until (1 + rnd.nextInt(6))).map(_ =>
          alpha(rnd.nextInt(alpha.length))).mkString).mkString(" ")
    }
    val df = docs.toDF("doc_id", "text")
    val merges = Bpe.train(df, "text", "doc_id", nMerges = 30)
    assert(merges.nonEmpty)
    val ranks = BpeKernels.prepare(merges)
    val viaKernel = df.select(col("doc_id"),
        BpeExprs.bpeCount(s, col("text"), merges).as("n"),
        BpeExprs.bpeTokenize(s, col("text"), merges).as("toks"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[String](2))).toSeq
    viaKernel.foreach { case (id, n, toks) =>
      val expected = docs(id.toInt)._2.trim.toLowerCase.split("\\s+")
        .filter(_.nonEmpty)
        .flatMap(w => BpeKernels.encodeWord(w, ranks)).toSeq
      assert(toks == expected, s"doc $id")
      assert(n == expected.length)
      // merges joined some characters somewhere in the corpus
    }
    val totalChars = docs.map(_._2.count(_ != ' ')).sum
    val totalToks = viaKernel.map(_._2).sum
    assert(totalToks < totalChars, "no merge ever applied")
  }
}

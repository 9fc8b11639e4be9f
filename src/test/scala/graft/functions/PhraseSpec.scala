package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PhraseSpec extends SparkSpec {
  import spark.implicits._

  /** Reference: non-overlapping greedy-left count = what both
    * `replace`-length arithmetic (the oracle) and split-count
    * compute. */
  private def refCount(text: String, phrase: String): Long = {
    var n = 0L
    var i = text.indexOf(phrase)
    while (i >= 0) { n += 1; i = text.indexOf(phrase, i + phrase.length) }
    n
  }

  private def kernelCounts(texts: Seq[String],
      phrases: Seq[String]): Map[String, Seq[Long]] =
    texts.toDF("t")
      .select(col("t"),
        PhraseCountExpr.phraseCounts(spark, col("t"), phrases).as("c"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1))
      .toMap

  test("kernel equals the greedy non-overlap reference on corpus-like text") {
    val vocab = Seq("hash", "join", "slow", "query", "sort", "merge",
      "table", "scan", "window", "agg", "the", "a")
    val rnd = new scala.util.Random(7)
    val texts = (0 until 50).map { _ =>
      (0 until (5 + rnd.nextInt(60))).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    }
    val phrases = Seq("hash join", "slow query", "sort merge",
      "table scan", "window agg", "the", "join slow")
    val got = kernelCounts(texts, phrases)
    texts.foreach { t =>
      phrases.zipWithIndex.foreach { case (p, i) =>
        assert(got(t)(i) === refCount(t, p), s"phrase '$p' in '$t'")
      }
    }
  }

  test("overlap traps: greedy-left non-overlap, phrases counted independently") {
    val phrases = Seq("a a", "aa", "ab ab", "b", "ba")
    val texts = Seq(
      "a a a",        // 'a a' at 0 and (overlapping) 2 -> greedy 1
      "aaaa",         // 'aa' -> 2, not 3
      "ab ab ab",     // 'ab ab' at 0 and (overlapping) 3 -> greedy 1
      "bababab",      // 'b' -> 4; 'ba' -> 3
      "")
    val got = kernelCounts(texts, phrases)
    assert(got("a a a") === Seq(1L, 0L, 0L, 0L, 0L))
    assert(got("aaaa") === Seq(0L, 2L, 0L, 0L, 0L))
    assert(got("ab ab ab") === Seq(0L, 0L, 1L, 3L, 0L))
    assert(got("bababab") === Seq(0L, 0L, 0L, 4L, 3L))
    assert(got("") === Seq(0L, 0L, 0L, 0L, 0L))
    // cross-check every cell against the reference
    texts.foreach { t =>
      phrases.zipWithIndex.foreach { case (p, i) =>
        assert(got(t)(i) === refCount(t, p), s"phrase '$p' in '$t'")
      }
    }
  }

  test("shared prefixes/suffixes and fail-link suffix outputs") {
    // 'she'/'he'/'hers' is the canonical Aho-Corasick example: 'he'
    // must be found INSIDE 'she' via the failure/output links.
    val phrases = Seq("she", "he", "hers", "his")
    val got = kernelCounts(Seq("ushers", "shehehers his"), phrases)
    assert(got("ushers") === Seq(1L, 1L, 1L, 0L))
    assert(got("shehehers his") === Seq(1L, 3L, 1L, 1L))
  }

  test("kernel equals the split-count declarative form through Spark") {
    val phrases = Seq("table scan", "a a")
    val texts = Seq("table scan a a a table scan", "a a a a", "scan table")
    val df = texts.toDF("t").select(col("t"),
      PhraseCountExpr.phraseCounts(spark, col("t"), phrases).as("c"),
      (size(split(col("t"), Pattern.quote(phrases(0)), -1)) - 1).as("s0"),
      (size(split(col("t"), Pattern.quote(phrases(1)), -1)) - 1).as("s1"))
    df.collect().foreach { r =>
      val c = r.getSeq[Long](1)
      assert(c(0) === r.getInt(2).toLong, s"split parity p0 on '${r.getString(0)}'")
      assert(c(1) === r.getInt(3).toLong, s"split parity p1 on '${r.getString(0)}'")
    }
  }
}

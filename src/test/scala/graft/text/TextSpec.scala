package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{LangIdExpr, MinMd5FingerprintExpr, TextStatsExpr}

/** Native lang_id kernel ≡ the declarative regexp_count form on edge
  * cases the single-pass scanner must get right: word boundaries
  * inside larger words, punctuation/underscore/digit adjacency, CJK
  * short-circuit, ties, and empty/stopword-free text.
  */
class TextSpec extends SparkSpec {

  test("native lang_id matches the declarative langId") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      "The cat and the dog sat in the garden with a ball",
      "Le chat est dans la maison et les oiseaux dans les arbres",
      "El perro corre por el parque con los gatos como siempre",
      "Der Hund ist nicht mit der Katze und das ist gut",
      "THE AND OF TO uppercase shouting still counts",
      "theory android often into ThisThat witherless", // substrings must NOT count
      "the_x and7 of2 to3 in_ is9 that_x with_y",      // _ and digits extend the word run
      "x the y 这是中文 the the the",                    // CJK wins regardless of scores
      "nothing matches here whatsoever",
      "le la the and 0 0",                             // en/fr tie: 2 v 2 -> first in order
      "")
      .toDF("text")
    val both = docs.select(
      TextAnalysis.langId(col("text")).as("decl"),
      LangIdExpr.langId(spark, col("text")).as("native"),
      col("text")).collect()
    both.foreach { r =>
      assert(r.getString(0) == r.getString(1),
        s"'${r.getString(2)}': decl=${r.getString(0)} native=${r.getString(1)}")
    }
    // And the specific expectations, so BOTH forms are pinned.
    val natives = both.map(_.getString(1)).toSeq
    assert(natives == Seq("en", "fr", "es", "de", "en", "und", "und", "zh",
      "und", "en", "und"), natives.toString)
  }

  test("native text_stats matches the declarative metrics") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      "The quick brown fox 123!",
      "  leading and trailing spaces  ",
      "\ttab-led line\n",     // tab/newline are NOT trimmed -> empty tokens
      "a",
      " ",                      // all-space -> trim to empty -> 1 token
      "multi   space   runs",
      "naïve café 中文 mixed")
      .toDF("text")
    val m = TextAnalysis.qualityMetrics(col("text")).toMap
    val st = TextStatsExpr.textStats(spark, col("text"))
    val both = docs.select(
      m("n_tokens").as("d_tok"), element_at(st, 1).as("n_tok"),
      m("alpha_ratio").as("d_alpha"),
      round(element_at(st, 2).cast("double") /
        element_at(st, 4).cast("double"), 4).as("n_alpha"),
      m("space_ratio").as("d_space"),
      round(element_at(st, 3).cast("double") /
        element_at(st, 4).cast("double"), 4).as("n_space"),
      m("mean_word_len").as("d_mwl"),
      round((element_at(st, 4) - element_at(st, 3)).cast("double") /
        element_at(st, 1).cast("double"), 4).as("n_mwl"),
      col("text")).collect()
    both.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), s"tokens: '${r.getString(8)}'")
      assert(r.getDouble(2) == r.getDouble(3), s"alpha: '${r.getString(8)}'")
      assert(r.getDouble(4) == r.getDouble(5), s"space: '${r.getString(8)}'")
      assert(r.getDouble(6) == r.getDouble(7), s"mwl: '${r.getString(8)}'")
    }
    val bpe = docs.select(
      TextAnalysis.approxBpeTokenCount(col("text")).as("decl"),
      element_at(st, 5).as("native"), col("text")).collect()
    bpe.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), s"bpe: '${r.getString(2)}'")
    }
    val score = docs.select(
      TextAnalysis.qualityScore(col("text")).as("decl"),
      TextAnalysis.qualityScoreFast(spark, col("text")).as("native"),
      col("text")).collect()
    score.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), s"score: '${r.getString(2)}'")
    }
  }

  test("repetition signals: dup-word fraction and word bigrams") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      ("a b a b a", 3.0 / 5, Seq("a b", "b a", "a b", "b a")),
      ("x y z", 0.0, Seq("x y", "y z")),
      ("SAME same Same", 2.0 / 3, Seq("same same", "same same")))
      .toDF("text", "want_frac", "want_grams")
    docs.select(TextAnalysis.dupWordFrac(col("text")).as("f"),
        TextAnalysis.wordBigrams(col("text")).as("g"),
        col("want_frac"), col("want_grams"), col("text")).collect()
      .foreach { r =>
        assert(r.getDouble(0) == math.rint(r.getDouble(2) * 1e4) / 1e4,
          s"dupWordFrac '${r.getString(4)}'")
        assert(r.getSeq[String](1) == r.getSeq[String](3),
          s"bigrams '${r.getString(4)}': ${r.getSeq[String](1)}")
      }
  }

  test("native min-md5 fingerprint matches the declarative form") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaa",                  // identical windows
      "exactly8",                          // len == k: single window
      "short",                             // len < k: whole-text md5
      "",                                  // empty
      "naïve café — déjà vu über alles",   // multibyte UTF-8
      "中文字符串也要分窗口哈希正确处理",       // CJK, 3-byte chars
      "emoji 😀 surrogate pair inside text") // supplementary
      .toDF("text")
    val both = docs.select(
      TextAnalysis.fingerprintMd5(col("text"), 8).as("decl"),
      MinMd5FingerprintExpr.minMd5Fingerprint(spark, col("text"), 8)
        .as("native"),
      col("text")).collect()
    both.foreach { r =>
      assert(r.getString(0) == r.getString(1),
        s"'${r.getString(2)}': decl=${r.getString(0)} native=${r.getString(1)}")
    }
  }
}

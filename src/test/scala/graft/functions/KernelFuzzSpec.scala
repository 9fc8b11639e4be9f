package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.similarity.Similarity
import graft.text.TextAnalysis

/** Seeded fuzz over the native kernels: every kernel must equal its
  * declarative reference on a few hundred adversarial random inputs
  * (mixed whitespace kinds, unicode, stopwords embedded in junk,
  * pathological repetition) — one Spark job per kernel pair, not one
  * per case.
  */
class KernelFuzzSpec extends SparkSpec {

  private val rnd = new scala.util.Random(20260812L)

  private def randomText(): String = {
    // İ (U+0130) lowercases to TWO codepoints — the nastiest case for
    // any kernel that must match lower()-based token measuring.
    val alphabet =
      "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789" +
        "     \t\n..,;:!?'\"()-_@/%中文字éüñß日本語İ "
    val words = Seq("the", "and", "les", "est", "las", "der", "und", "mit",
      "theory", "into", "x_y", "a1")
    val n = rnd.nextInt(200)
    val sb = new StringBuilder
    var i = 0
    while (i < n) {
      if (rnd.nextInt(8) == 0) {
        sb.append(words(rnd.nextInt(words.length))).append(' ')
        i += 4
      } else {
        sb.append(alphabet.charAt(rnd.nextInt(alphabet.length)))
        i += 1
      }
    }
    sb.toString
  }

  test("text kernels equal their declarative forms on 300 fuzz strings") {
    val s = spark
    import s.implicits._
    val docs = ((0 until 300).map(_ => randomText()) ++
      Seq("", " ", "\t", "exact8ch")).toDF("text")
    val st = TextStatsExpr.textStats(spark, col("text"))
    val m = TextAnalysis.qualityMetrics(col("text")).toMap
    val bad = docs.select(
      col("text"),
      TextAnalysis.langId(col("text")).as("d_lang"),
      LangIdExpr.langId(spark, col("text")).as("n_lang"),
      m("n_tokens").as("d_tok"), element_at(st, 1).as("n_tok"),
      TextAnalysis.approxBpeTokenCount(col("text")).as("d_bpe"),
      element_at(st, 5).as("n_bpe"),
      TextAnalysis.fingerprintMd5(col("text"), 8).as("d_fp"),
      MinMd5FingerprintExpr.minMd5Fingerprint(spark, col("text"), 8).as("n_fp"))
      .where(col("d_lang") =!= col("n_lang") ||
        col("d_tok") =!= col("n_tok") ||
        col("d_bpe") =!= col("n_bpe") ||
        col("d_fp") =!= col("n_fp"))
      .collect()
    assert(bad.isEmpty, bad.take(3).map(_.toString).mkString("\n"))
  }

  test("repetition_stats equals the declarative explode pipeline on fuzz strings") {
    val s = spark
    import s.implicits._
    // 903 "one" has no bigram (must drop on both paths); 902 "\t"
    // splits to two EMPTY tokens whose single bigram is " ".
    val docs = ((0 until 200).map(i => (i.toLong, randomText())) ++
      Seq((900L, ""), (901L, " "), (902L, "\t"), (903L, "one"),
        (904L, "a a b a a")))
      .toDF("doc_id", "text")
    val decl = docs.select(col("doc_id"),
        TextAnalysis.dupWordFrac(col("text")).as("f"),
        explode(TextAnalysis.wordBigrams(col("text"))).as("gram"))
      .groupBy(col("doc_id"), col("f"), col("gram"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"), col("f"))
      .agg(max(col("c")).as("max_c"), sum(col("c")).as("n_grams"))
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getLong(2), r.getLong(3)))).toMap
    val re = RepetitionExpr.repetitionStats(spark, col("text"))
    val native = docs.select(col("doc_id"), re.as("r"))
      .where(element_at(col("r"), 3) >= 1L)
      .select(col("doc_id"),
        round(lit(1.0) - element_at(col("r"), 2).cast("double") /
          element_at(col("r"), 1).cast("double"), 4).as("f"),
        element_at(col("r"), 4).as("max_c"),
        element_at(col("r"), 3).as("n_grams"))
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getLong(2), r.getLong(3)))).toMap
    assert(decl.keySet == native.keySet,
      s"docs differ: ${decl.keySet.diff(native.keySet)} / ${native.keySet.diff(decl.keySet)}")
    val bad = decl.collect { case (id, v) if native(id) != v =>
      s"doc $id: decl=$v native=${native(id)}" }
    assert(bad.isEmpty, bad.take(3).mkString("\n"))
  }

  test("phrase_count equals the indexOf reference on 300 fuzz strings") {
    val s = spark
    import s.implicits._
    // Phrases chosen to stress fail links and self-overlap: shared
    // prefixes ("the"/"theo"), single chars, a periodic needle, and a
    // phrase containing another phrase.
    val phrases = Seq("the", "theory", "a", "aa", "es", "les ", " and ")
    def ref(t: String, p: String): Long = {
      var n = 0L; var i = t.indexOf(p)
      while (i >= 0) { n += 1; i = t.indexOf(p, i + p.length) }
      n
    }
    val docs = ((0 until 300).map(_ => randomText()) ++
      Seq("", "aaaa", "aaaaa", "the theory", "lesles les ")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val got = docs.select(col("id"), col("text"),
      PhraseCountExpr.phraseCounts(spark, col("text"), phrases).as("c"))
      .collect()
    val bad = got.flatMap { r =>
      val t = r.getString(1); val c = r.getSeq[Long](2)
      phrases.zipWithIndex.collect {
        case (p, i) if c(i) != ref(t, p) =>
          s"id=${r.getLong(0)} phrase='$p' kernel=${c(i)} ref=${ref(t, p)}"
      }
    }
    assert(bad.isEmpty, bad.take(3).mkString("\n"))
  }

  test("rp_lsh_sig equals the declarative signature on 200 fuzz vectors") {
    val s = spark
    import s.implicits._
    val vecs = (0 until 200).map { i =>
      (i.toLong, Array.fill(1 + rnd.nextInt(64))(rnd.nextFloat() * 20 - 10))
    }.toDF("id", "v")
    val bad = vecs.select(
      col("id"),
      Similarity.rpLshSignature(col("v")).as("decl"),
      RpLshSigExpr.rpLshSig(spark, col("v")).as("native"))
      .where(col("decl") =!= col("native"))
      .collect()
    assert(bad.isEmpty, bad.take(3).map(_.toString).mkString("\n"))
  }
}

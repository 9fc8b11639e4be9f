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

  test("tie-break compares code points, not UTF-16 code units") {
    // U+FF01 (FULLWIDTH !) is ONE char; U+10000 is a surrogate PAIR
    // whose high surrogate D800 < FF01 in code-unit order but whose
    // code point 0x10000 > 0xFF01 — the orders disagree exactly here
    val bmp = "！"
    val astral = new String(Character.toChars(0x10000))
    assert(bmp.compareTo(astral) > 0) // JVM code-unit order: astral first
    assert(Bpe.codePointCompare(bmp, astral) < 0) // code points: bmp first
    // prefix rule unchanged
    assert(Bpe.codePointCompare("ab", "abc") < 0)
    assert(Bpe.codePointCompare("abc", "ab") > 0)
    assert(Bpe.codePointCompare("ab", "ab") == 0)
  }

  test("trainMd5: merges equal train on the md5-rank-selected subset") {
    val s = spark
    import s.implicits._
    // 8 docs; md5 rank decides WHICH 3 train — replay the rule
    // driver-side and check trainMd5 == trainTexts on exactly those
    val docs = (0L to 7L).map(i => (i, s"w$i x$i aaab aaab c$i"))
    val df = docs.toDF("doc_id", "text")
    def md5hex13(x: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString.substring(0, 13)
    }
    val picked = docs.sortBy { case (id, _) => (md5hex13(id.toString), id) }
      .take(3).map(_._2).toArray
    val got = Bpe.trainMd5(df, "text", "doc_id", nMerges = 8,
      maxTrainDocs = 3)
    assert(got == Bpe.trainTexts(picked, 8))
    assert(got.nonEmpty && got.head == "a a") // aaab dominates any subset
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

  test("non-BMP text: code-point seeding keeps surrogate pairs whole") {
    val s = spark
    import s.implicits._
    // Supplementary-plane characters (emoji, supplementary CJK): each is
    // TWO UTF-16 chars. Char-wise seeding would split the surrogate
    // pair into two lone-surrogate symbols that UTF8String mangles to
    // replacement bytes — and distinct words would collide.
    val fire = new String(Character.toChars(0x1F525)) // 🔥
    val drop = new String(Character.toChars(0x1F4A7)) // 💧
    val cjk = new String(Character.toChars(0x20000))  // 𠀀 (ext-B)
    val docs = Seq(
      0L -> s"$fire$fire$drop $fire$drop",
      1L -> s"$cjk$fire $cjk$cjk",
      2L -> s"ab$fire ab$drop")
    val df = docs.toDF("doc_id", "text")
    val merges = Bpe.train(df, "text", "doc_id", nMerges = 10)
    val ranks = BpeKernels.prepare(merges)
    // Seed symbols are whole code points, never lone surrogates.
    BpeKernels.seedSymbols(s"$fire$drop$cjk" + "x").foreach { sym =>
      assert(!sym.exists(Character.isSurrogate) || sym.length == 2,
        s"split surrogate in '$sym'")
      assert(sym.codePointCount(0, sym.length) == 1)
    }
    val out = df.select(col("doc_id"),
        BpeExprs.bpeTokenize(s, col("text"), merges).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // No token round-trips through UTF8String as replacement chars, and
    // every token's characters come from the input alphabet.
    val legal = Set(fire, drop, cjk, "a", "b")
    out.values.flatten.foreach { tok =>
      assert(!tok.contains('�'), s"mangled token '$tok'")
      assert(BpeKernels.seedSymbols(tok).forall(legal.contains),
        s"token '$tok' contains foreign symbols")
    }
    // kernel ≡ driver on the same text (fire-fire merges learned from
    // doc 0 apply identically in both)
    docs.foreach { case (id, text) =>
      val expected = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .flatMap(w => BpeKernels.encodeWord(w, ranks)).toSeq
      assert(out(id) == expected, s"doc $id")
    }
  }
}

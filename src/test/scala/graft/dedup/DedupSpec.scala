package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Correctness of the approximate dedup paths against exact answers on
  * a corpus with planted near-duplicates. */
class DedupSpec extends SparkSpec {

  private val vocab = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu".split(" ")

  /** 40 base docs of 30 deterministic pseudo-random words + 10 near-dup
    * variants (one word substituted) + 2 exact copies. */
  private lazy val corpus = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val base = (0 until 40).map { i =>
      i.toLong -> (0 until 30).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    }
    val nearDups = (0 until 10).map { i =>
      val (id, text) = base(i)
      val words = text.split(" ")
      words(15) = "REPLACED"
      (100L + id) -> words.mkString(" ")
    }
    val exactDups = Seq(200L -> base(0)._2, 201L -> base(1)._2)
    (base ++ nearDups ++ exactDups).toDF("doc_id", "text")
  }

  test("exact dedup groups identical texts under min id") {
    val res = Dedup.exact(corpus, "text", "doc_id")
    val dups = res.where(col("n_copies") > 1).collect()
    assert(dups.length == 2)
    assert(dups.map(_.getAs[Long]("canonical_id")).sorted.toSeq == Seq(0L, 1L))
    assert(dups.forall(_.getAs[Long]("n_copies") == 2))
  }

  test("exact jaccard pairs find planted near-dups and exact dups") {
    val pairs = Dedup.jaccardPairs(corpus, "text", "doc_id", n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 1-word edit in 30 words kills 3 of 28 shingles → j = 25/31 ≈ 0.81
    (0 until 10).foreach { i =>
      assert(pairs.contains((i.toLong, 100L + i)), s"missing near-dup pair $i")
    }
    assert(pairs.contains((0L, 200L)) && pairs.contains((1L, 201L)))
  }

  test("prefix-filtered jaccard equals the full inverted-index join") {
    val full = Dedup.jaccardPairs(corpus, "text", "doc_id",
        n = 3, threshold = 0.5, maxShingleDf = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pref = Dedup.jaccardPairsPrefix(corpus, "text", "doc_id",
        n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(full.nonEmpty)
    assert(pref == full,
      s"prefix-only: ${(pref -- full).take(3)}; full-only: ${(full -- pref).take(3)}")
  }

  test("containment finds a quoted subset that jaccard misses") {
    val s = spark
    import s.implicits._
    // doc 1 is quoted wholesale inside doc 2, which is ~5× longer:
    // containment(1 ⊂ 2) = 100%, but jaccard ≈ |A|/|B| ≈ 0.2.
    val quote = (0 until 12).map(i => vocab(i % vocab.length)).mkString(" ")
    val padding = (0 until 48).map(i => s"filler$i").mkString(" ")
    val docs = Seq(1L -> quote, 2L -> s"$padding $quote",
      3L -> "totally unrelated content here").toDF("doc_id", "text")
    val contained = Dedup.containmentPairs(docs, "text", "doc_id",
      n = 3, minBp = 9000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(contained.toSeq == Seq((1L, 2L, 10000L)), contained.mkString(","))
    // the same pair is invisible to jaccard at any useful threshold
    val j = Dedup.jaccardPairs(docs, "text", "doc_id", n = 3, threshold = 0.5)
      .collect()
    assert(j.isEmpty)
    // directionality: the long container is only fractionally inside
    // the quote (shared 10 of its 58 shingles → well under 5000 bp)
    val bp21 = Dedup.containmentPairs(docs, "text", "doc_id", n = 3, minBp = 1)
      .where(col("contained") === 2L).collect().map(_.getLong(2))
    assert(bp21.length == 1 && bp21.head < 5000, bp21.mkString(","))
  }

  test("minhash LSH achieves full recall on high-jaccard pairs here") {
    val exact = Dedup.jaccardPairs(corpus, "text", "doc_id", n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Dedup.minhashNearDups(corpus, "text", "doc_id",
      k = 64, bands = 16, n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // verification step makes approx ⊆ exact; recall on j≥0.8 pairs
    // with b=16, r=4 is 1-(1-0.8^4)^16 ≈ 0.9998 per pair
    assert(approx.subsetOf(exact))
    assert(exact.forall(approx.contains), s"LSH missed ${exact -- approx}")
  }

  test("md5 minhash twin: verified subset, j=1 always found, high-j recall") {
    // twin threshold 5000 bp ≡ the exact tier's 0.5: the verify step
    // makes twin ⊆ exact. b=4, r=4 banding recalls a j≈0.81 pair with
    // prob 1-(1-0.81^4)^4 ≈ 0.90, so a few planted near-dups may miss
    // (the deterministic draws land ~binomially); j=1 pairs have
    // identical signatures and are ALWAYS found. Gate: subset, exact
    // dups present, and ≥ 2/3 recall on the high-j set (a hash-family
    // regression would crater it).
    val exact = Dedup.jaccardPairs(corpus, "text", "doc_id", n = 3,
        threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val twin = Dedup.minhashNearDupsMd5(corpus, "text", "doc_id",
        k = 16, bands = 4, n = 3, thresholdBp = 5000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(twin.subsetOf(exact))
    assert(twin.contains((0L, 200L)) && twin.contains((1L, 201L)),
      "identical docs must always collide (equal signatures)")
    val recall = twin.size.toDouble / exact.size
    assert(recall >= 2.0 / 3.0,
      s"twin recall $recall (${twin.size}/${exact.size}); " +
        s"missed ${exact -- twin}")
    // bp values are exact integers: the exact-dup pairs score 10000
    val bp = Dedup.minhashNearDupsMd5(corpus, "text", "doc_id",
        k = 16, bands = 4, n = 3, thresholdBp = 5000L)
      .where(col("doc_a") === 0L && col("doc_b") === 200L)
      .collect().map(_.getLong(2))
    assert(bp.toSeq == Seq(10000L))
  }

  test("md5 simhash twin: exact dups at hamming 0, near-dups recovered") {
    val got = Dedup.simhashNearDupsMd5(corpus, "text", "doc_id",
        maxDist = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    // exact copies: identical 52-bit signatures
    assert(got.get((0L, 200L)).contains(0L), got.get((0L, 200L)).toString)
    assert(got.get((1L, 201L)).contains(0L))
    // every released pair is within the declared distance
    assert(got.values.forall(h => h >= 0L && h <= 3L))
    // driver-side replay of one signature: same md5 bit sums
    val text0 = corpus.where(col("doc_id") === 0L)
      .collect()(0).getString(1)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val toks = text0.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
    var sig = 0L
    (0 until 52).foreach { b =>
      val s = toks.map { t =>
        val hv = java.lang.Long.parseLong(
          md5hex("sh|" + t).substring(0, 13), 16)
        if (((hv >>> b) & 1L) == 1L) 1L else -1L
      }.sum
      if (s > 0) sig |= (1L << b)
    }
    val gotSig = Dedup.simhashNearDupsMd5(
      corpus.where(col("doc_id").isin(0L, 200L)), "text", "doc_id", 3)
      .collect().map(_.getLong(2))
    assert(gotSig.toSeq == Seq(0L)) // the planted copy pair survives
    assert(sig > 0L) // replay produced a real signature (sanity)
  }

  test("minhash df cutoff drops boilerplate-driven pairs only") {
    val noCut = Dedup.jaccardPairs(corpus, "text", "doc_id", n = 3, threshold = 0.5)
    val cut = Dedup.jaccardPairs(corpus, "text", "doc_id", n = 3,
      threshold = 0.5, maxShingleDf = 50)
    assert(cut.count() == noCut.count()) // no shingle is that common here
  }

  test("simhash: identical docs hamming 0, near-dups close, distinct far") {
    val s = spark
    import s.implicits._
    val hashed = corpus.select(col("doc_id"),
      Dedup.simhash64(col("text")).as("h")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashed(0L) == hashed(200L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hashed(0L), hashed(100L)) <= 12) // 1-word edit: small drift
    val interDoc = for (i <- 2L to 8L) yield ham(hashed(i), hashed(i + 20))
    assert(interDoc.max > 12) // unrelated docs drift far
  }

  test("md5 twin kernels are bit-identical to the distributed reference chains") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    // minhash band keys: kernel vs explode/agg chain, every doc
    val kern = docs.select(col("doc_id").as("doc"),
      graft.functions.ShingleExprs.md5MinhashBands(spark, col("text"),
        16, 4, 3).as("kb"))
    val ref = Dedup.minhashMd5BandKeysRef(docs, "text", "doc_id",
      k = 16, bands = 4, n = 3).withColumnRenamed("bkeys", "rb")
    assert(kern.join(ref, Seq("doc"))
      .where(col("kb") =!= col("rb")).count() == 0)
    assert(kern.count() == ref.count())
    // simhash52: kernel vs 52-sum aggregate chain, every doc
    val ks = docs.select(col("doc_id").as("doc"),
      graft.functions.ShingleExprs.md5Simhash52(spark, col("text"))
        .as("kh")).where(col("kh") >= 0)
    val rs = Dedup.simhash52Ref(docs, "text", "doc_id")
      .withColumnRenamed("sh52", "rh")
    assert(ks.join(rs, Seq("doc")).where(col("kh") =!= col("rh"))
      .count() == 0)
    assert(ks.count() == rs.count())
    // the no-nonempty-token sentinel mirrors the reference's absent row
    val s = spark
    import s.implicits._
    val edge = Seq((1L, ""), (2L, "   "), (3L, "real words here"))
      .toDF("doc_id", "text")
    val ke = edge.select(col("doc_id"),
      graft.functions.ShingleExprs.md5Simhash52(spark, col("text"))
        .as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ke(1L) == -1L && ke(2L) == -1L && ke(3L) >= 0L)
    assert(Dedup.simhash52Ref(edge, "text", "doc_id").count() == 1L)
  }

  test("native shingle + minhash kernels are bit-identical to declarative forms") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val sh = docs.select(
      Dedup.shingles(col("text"), 3).as("decl"),
      graft.functions.ShingleExprs.wordShingles(spark, col("text"), 3).as("nat"))
    assert(sh.where(col("decl") =!= col("nat")).count() == 0)
    val sig = Dedup.minhashSignaturesDeclarative(docs, "text", "doc_id")
      .withColumnRenamed("sig", "decl")
      .join(Dedup.minhashSignatures(docs, "text", "doc_id")
        .withColumnRenamed("sig", "nat"), Seq("doc"))
    assert(sig.where(col("decl") =!= col("nat")).count() == 0)
  }

  test("native simhash expression is bit-identical to the declarative form") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val both = docs.select(
      Dedup.simhash64(col("text")).as("declarative"),
      graft.functions.SimHash64Expr.simhash64(spark, col("text")).as("native"))
    assert(both.where(col("declarative") =!= col("native")).count() == 0)
  }

  test("word windows: per-position, non-distinct, short-doc fallback") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a b a b a"), (2L, "x y")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
      graft.functions.ShingleExprs.wordWindows(s, col("text"), 3).as("w"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) == Seq("a b a", "b a b", "a b a")) // repeats kept
    assert(got(2L) == Seq("x y")) // shorter than one window
  }

  test("window hashes are xxhash64 of the string windows (real corpus)") {
    val s = spark
    val docs = graft.Tables.documents(s, "/root/testdata/sf0.001")
    // The hashed kernel that rides the dup-span shuffles must equal
    // xxhash64 applied to each window the string kernel emits —
    // asserting the twin relationship on every window of the corpus,
    // including the short-doc fallback rows.
    val both = docs.select(
      transform(
        graft.functions.ShingleExprs.wordWindows(s, col("text"), 10),
        w => xxhash64(w)).as("via_strings"),
      graft.functions.ShingleExprs.wordWindowHashes(s, col("text"), 10)
        .as("native"))
    assert(both.where(col("via_strings") =!= col("native")).count() == 0)
  }

  test("dupSpanStats: full copies score 1.0, partial overlap in between") {
    val s = spark
    import s.implicits._
    val a = "w1 w2 w3 w4 w5 w6 w7 w8"     // 6 windows at L=3
    val b = "w1 w2 w3 w4 z5 z6 z7 z8"     // shares the first 2 windows with a
    val df = Seq(0L -> a, 1L -> a, 2L -> b, 3L -> "u1 u2 u3 u4")
      .toDF("doc_id", "text")
    val got = Dedup.dupSpanStats(df, "text", "doc_id", windowTokens = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(0L) == ((6L, 6L, 1.0)))  // full copy of doc 1
    assert(got(1L) == ((6L, 6L, 1.0)))
    assert(got(2L) == ((6L, 2L, 0.3333))) // only the shared prefix windows
    assert(got(3L) == ((2L, 0L, 0.0)))
  }

  test("priority dedup keeps the lowest (priority, id) copy per group") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (5L, "Hello  World", 3L),  // same normalized text, worst source
      (6L, "hello   world ", 1L), // best source, lower id → canonical
      (7L, "hello world", 1L),    // best source, higher id
      (8L, "unique text", 2L)
    ).toDF("doc_id", "text", "prio")
    val got = Dedup.exactByPriority(df, "text", "doc_id", "prio")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq == Seq((6L, 1L, 3L, 2L), (8L, 2L, 1L, 1L)))
  }

  test("bloom filter: no false negatives, bounded false positives") {
    val s = spark
    import s.implicits._
    val members = (0 until 500).map(i => s"member_$i").toDF("key")
    val bloom = BloomFilters.build(members, "key", 500, fpp = 0.01)
    // every member passes (bloom property: zero false negatives)
    assert(members.where(bloom.mightContain(s, col("key"))).count() == 500)
    // non-members pass at ~fpp; allow generous slack over 1%
    val nonMembers = (0 until 2000).map(i => s"other_$i").toDF("key")
    val fp = nonMembers.where(bloom.mightContain(s, col("key"))).count()
    assert(fp <= 100, s"false-positive count $fp out of 2000 (expected ~20)")
    // the native probe kernel is bit-identical to the declarative
    // Column probe on members and non-members alike
    val both = members.unionByName(nonMembers)
      .select(bloom.mightContain(s, col("key")).as("kernel"),
        bloom.mightContainColumns(col("key")).as("declarative"))
    assert(both.where(col("kernel") =!= col("declarative")).count() == 0)
  }

  test("bloom-prefiltered decontamination equals the exact screen") {
    val bench = corpus.where(col("doc_id") < 5)
    val exact = Dedup.contaminated(corpus, bench, "text", "doc_id", n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bloomed = Dedup.contaminatedBloom(corpus, bench, "text", "doc_id", n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bloomed == exact)
  }

  test("size guard auto-routes contaminated to the bloom plan, same output") {
    val bench = corpus.where(col("doc_id") < 5)
    val keyOf = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getLong(1))
    val viaBroadcast = Dedup.contaminated(corpus, bench, "text", "doc_id",
      n = 5).collect().map(keyOf).toSet
    // benchBroadcastMax = 0 forces every bench past the guard — the
    // routed plan must be bit-identical (bloom FPs die in the confirm)
    val routed = Dedup.contaminated(corpus, bench, "text", "doc_id",
      n = 5, benchBroadcastMax = 0L).collect().map(keyOf).toSet
    assert(routed == viaBroadcast)
  }

  test("size guard auto-routes contaminationScore too, same output") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (0L, "a b c d e f"), (1L, "a b c d e f"),
      (2L, "a b c d e zz xx"), (3L, "p q r s t u")).toDF("doc_id", "text")
    val bench = df.where(col("doc_id") === 0)
    def rows(bm: Long) = Dedup.contaminationScore(df, bench, "text",
        "doc_id", n = 5, benchBroadcastMax = bm)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(rows(0L) == rows(Long.MaxValue))
  }

  test("contaminationScore: basis points of shared distinct shingles") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (0L, "a b c d e f"),       // bench doc: 2 distinct 5-gram windows
      (1L, "a b c d e f"),       // full copy → all shingles shared
      (2L, "a b c d e zz xx"),   // shares "a b c d e" (1 of 3)
      (3L, "p q r s t u")        // disjoint → 0
    ).toDF("doc_id", "text")
    val got = Dedup.contaminationScore(df, df.where(col("doc_id") === 0),
      "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (0L, 2L, 2L, 10000L),
      (1L, 2L, 2L, 10000L),
      (2L, 3L, 1L, 3333L),
      (3L, 2L, 0L, 0L)))
  }

  test("trimDupSpans drops duplicated spans, keeping the corpus-wide first occurrence") {
    val s = spark
    import s.implicits._
    val aText = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11 t12" // 12 tokens → 3 windows at L=10
    val tail = "u1 u2 u3 u4 u5"
    val df = Seq(
      (0L, aText),                                  // first occurrences → untouched
      (1L, aText),                                  // exact copy → fully trimmed
      (2L, s"t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 $tail"), // shares window pos 0 → prefix dropped
      (3L, "x1 x2 x3 x4 x5")                        // unique short doc → untouched
    ).toDF("doc_id", "text")
    val out = Dedup.trimDupSpans(df, "text", "doc_id", windowTokens = 10)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4))))
      .toMap
    assert(out(0L) == ((aText, 12, 0, 12)))
    assert(out(1L) == (("", 12, 12, 0)))
    assert(out(2L) == ((tail, 15, 10, 5)))
    assert(out(3L) == (("x1 x2 x3 x4 x5", 5, 0, 5)))
  }

  test("simhash pigeonhole join finds all pairs within maxDist") {
    val pairs = Dedup.simhashCandidatePairs(corpus, "text", "doc_id", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue))
    // exact copies must surface at distance 0
    assert(pairs.exists(p => p._1 == 0L && p._2 == 200L && p._3 == 0L))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 201L && p._3 == 0L))
    // and nothing beyond the bound leaks through
    assert(pairs.forall(_._3 <= 3))
  }
}

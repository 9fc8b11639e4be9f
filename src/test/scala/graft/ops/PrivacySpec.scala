package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Driver-side replay of the deterministic Laplace draw. */
  private def noiseMicro(key: String, eps: Double): Long = {
    val raw = java.lang.Long
      .parseLong(md5hex("dp|" + key).substring(0, 13), 16).toDouble
    val u = math.max(raw, 1.0) / 4503599627370496.0
    val c = u - 0.5
    math.floor(-1.0 / eps * math.signum(c) *
      math.log(1.0 - 2.0 * math.abs(c)) * 1000000.0).toLong
  }

  private lazy val rows = (0 until 400).map { i =>
    (s"k${i % 100}", i.toLong) // 100 groups of 4 rows
  }

  test("distributed noisy counts equal the driver-side replay") {
    val df = rows.toDF("g", "v")
    val got = Privacy.noisyCounts(df, Seq("g"), eps = 1.0, minRelease = 3L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the released key SET is exactly the noisy-threshold survivors —
    // suppressed groups are gone entirely (key and value)
    val want = (0 until 100).map(i => s"k$i")
      .map(g => g -> (4L * 1000000L + noiseMicro(g, 1.0)))
      .filter(_._2 >= 3000000L).toMap
    assert(want.nonEmpty && want.size < 100,
      "fixture must exercise both release and suppression")
    assert(got == want)
  }

  test("noise is Laplace-shaped: bounded, sign-balanced, eps-scaled") {
    val keys = (0 until 500).map(i => s"key$i")
    val n1 = keys.map(noiseMicro(_, 1.0))
    // |noise| <= ln(2^51)/eps in micro-units (the clamp bound)
    val bound = (math.log(4503599627370496.0 / 2.0) * 1e6).toLong + 1
    assert(n1.forall(n => math.abs(n) <= bound))
    // the md5 uniform is symmetric: both signs well represented
    val neg = n1.count(_ < 0)
    assert(neg > 150 && neg < 350, s"negative draws: $neg/500")
    // most mass within 3b of 0 (Laplace tail: P(|x|>3b) = e^-3 ~ 5%)
    val within = n1.count(n => math.abs(n) <= 3000000L)
    assert(within > 400, s"within 3b: $within/500")
    // doubling eps exactly halves the pre-floor noise; the floored
    // values must match a replay at eps=2, and shrink in magnitude
    val n2 = keys.map(noiseMicro(_, 2.0))
    n1.zip(n2).foreach { case (a, b) =>
      assert(math.abs(b) <= math.abs(a) + 1)
    }
  }

  test("clipped noisy sums: clamp binds, replay exact, tagged noise domain") {
    val df = Seq(
      ("a", 100L), ("a", 3L), ("a", -7L), // 100 clips to 10, -7 to 0
      ("b", 5L), ("b", 5L)
    ).toDF("g", "v")
    val got = Privacy.noisySums(df, Seq("g"), "v", clip = 10L, eps = 1.0)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def sumNoise(key: String, b: Double): Long = {
      val raw = java.lang.Long
        .parseLong(md5hex("dp|sum:v|" + key).substring(0, 13), 16).toDouble
      val u = math.max(raw, 1.0) / 4503599627370496.0
      val c = u - 0.5
      math.floor(-b * math.signum(c) *
        math.log(1.0 - 2.0 * math.abs(c)) * 1000000.0).toLong
    }
    assert(got("a") == 13L * 1000000L + sumNoise("a", 10.0))
    assert(got("b") == 10L * 1000000L + sumNoise("b", 10.0))
    // the sum's noise domain differs from the count's for the same key
    assert(sumNoise("a", 1.0) != noiseMicro("a", 1.0))
  }

  test("gumbel top-k equals a driver replay; high eps recovers true order") {
    val counts = (0 until 60).map(i => (s"tok$i", (60 - i).toLong * 3))
    val df = counts.toDF("token", "c")
    // eps is the TOTAL budget: the replay spends eps/k per draw
    def score(key: String, c: Long, eps: Double, k: Int): Long = {
      val raw = java.lang.Long
        .parseLong(md5hex("dp|topk|" + key).substring(0, 13), 16).toDouble
      val u = math.max(raw, 1.0) / 4503599627370496.0
      math.floor((c.toDouble * (eps / 2.0 / k.toDouble) -
        math.log(-math.log(u))) * 1000000.0).toLong
    }
    val got = Privacy.gumbelTopK(df, "token", "c", eps = 1.0, k = 10)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val want = counts.map { case (t, c) => (t, score(t, c, 1.0, 10)) }
      .sortBy { case (t, s) => (-s, t) }.take(10).map(_._1)
    assert(got.map(_._2).toSeq == want)
    // high eps: the count signal dwarfs the Gumbel noise (counts gap
    // by 3·(eps/k)/2 = 96 micro-scaled vs Gumbel spread ~ a few) — the
    // release is exactly the true top-10
    val exact = Privacy.gumbelTopK(df, "token", "c", eps = 640.0, k = 10)
      .collect().sortBy(_.getLong(0)).map(_.getString(1)).toSeq
    assert(exact == counts.sortBy { case (t, c) => (-c, t) }
      .take(10).map(_._1))
  }

  test("a secret salt re-keys every draw; empty salt is the replayable mode") {
    val df = (0 until 40).map(i => (s"k${i % 10}", i.toLong)).toDF("g", "v")
    // minRelease below the noise floor: every group releases in both
    // runs, so the key sets compare group-for-group
    val open = Privacy.noisyCounts(df, Seq("g"), eps = 1.0,
        minRelease = -100L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Privacy.noisyCounts(df, Seq("g"), eps = 1.0,
        minRelease = -100L, salt = "s3cret")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // same groups, same true counts underneath — but the adversary's
    // unsalted replay no longer matches any salted draw
    assert(open.keySet == salted.keySet)
    assert(open.keys.count(k => open(k) != salted(k)) >= 8,
      "salting must re-key (essentially) every noise draw")
    // empty salt replays driver-side (the oracle mode)
    open.foreach { case (g, noisy) =>
      assert(noisy == 4L * 1000000L + noiseMicro(g, 1.0), s"group $g")
    }
  }

  test("suppression thresholds on the noisy value, not the true count") {
    // a group of exactly minRelease rows with negative noise must
    // suppress; one with positive noise must release — find one of
    // each among deterministic keys
    val negKey = (0 until 1000).map(i => s"n$i")
      .find(noiseMicro(_, 1.0) < -100000L).get
    val posKey = (0 until 1000).map(i => s"p$i")
      .find(noiseMicro(_, 1.0) > 100000L).get
    val df = (Seq.fill(5)(negKey) ++ Seq.fill(5)(posKey))
      .zipWithIndex.toDF("g", "v")
    val got = Privacy.noisyCounts(df, Seq("g"), eps = 1.0, minRelease = 5L)
      .collect().map(r => r.getString(0)).toSet
    // the suppressed group vanishes — key and value — because over a
    // data-dependent key domain its mere presence would leak count>=1
    assert(!got.contains(negKey), "below-threshold group must be dropped")
    assert(got.contains(posKey), "above-threshold group must release")
  }

  test("dataset card: three sections, pairwise-independent noise domains") {
    val docs = Seq(
      ("en", "alpha beta gamma"), ("en", "alpha beta"), ("en", "alpha"),
      ("en", "beta gamma"), ("de", "delta epsilon zeta"),
      ("de", "delta epsilon"), ("de", "delta"), ("de", "epsilon zeta"),
      ("fr", "eta")).toDF("lang", "text")
    val toks = docs.select(col("lang"),
      size(split(col("text"), " ")).cast("long").as("tok"))
    val tokenCounts = docs
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("c"))
    val card = Privacy.datasetCard(toks, Seq("lang"), "tok", clip = 64L,
      tokenCounts, "token", "c", epsCounts = 0.5, epsSums = 0.5,
      epsTopk = 0.5, minRelease = 2L, k = 3)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    val sections = card.map(_._1).toSet
    assert(sections == Set("count", "sum_tok", "top_token"))
    // fr has 1 doc: 1e6 + noise can never reach the 2e6 threshold
    // (|noise| < ln(2^51)/0.5 micro but the draw for 'fr' is fixed) —
    // verify suppression dropped it iff the replay says so
    val frNoisy = 1000000L + {
      val raw = java.lang.Long
        .parseLong(md5hex("dp|fr").substring(0, 13), 16).toDouble
      val u = math.max(raw, 1.0) / 4503599627370496.0
      val c = u - 0.5
      math.floor(-2.0 * math.signum(c) *
        math.log(1.0 - 2.0 * math.abs(c)) * 1000000.0).toLong
    }
    assert(card.exists(r => r._1 == "count" && r._2 == "fr") ==
      (frNoisy >= 2000000L))
    // key-set stability: the sums section publishes EXACTLY the
    // count-survivor keys — a count-suppressed group appears in NO
    // section (a sum row for it would reveal count >= 1 with certainty)
    val countKeys = card.filter(_._1 == "count").map(_._2).toSet
    val sumKeys = card.filter(_._1 == "sum_tok").map(_._2).toSet
    assert(sumKeys == countKeys,
      s"sums must release the count-survivor key set: $sumKeys vs $countKeys")
    // with every count suppressed, no count AND no sum rows remain
    val allSuppressed = Privacy.datasetCard(toks, Seq("lang"), "tok",
      clip = 64L, tokenCounts, "token", "c", epsCounts = 0.5,
      epsSums = 0.5, epsTopk = 0.5, minRelease = 1000L, k = 3)
      .collect()
    assert(allSuppressed.nonEmpty &&
      allSuppressed.forall(_.getString(0) == "top_token"),
      "all-suppressed card must carry only the top-k section")
    // top-k rows release rank + key ONLY
    card.filter(_._1 == "top_token").foreach { r =>
      assert(r._4.isEmpty, s"top-k must not release a value: $r")
      assert(r._3 >= 1L && r._3 <= 3L)
    }
    // the three mechanisms' uniforms are pairwise-distinct functions
    // of their tags: same key string, three different draws
    def u(domain: String, key: String): Double = {
      val raw = java.lang.Long
        .parseLong(md5hex(domain + key).substring(0, 13), 16).toDouble
      math.max(raw, 1.0) / 4503599627370496.0
    }
    Seq("en", "de", "fr", "alpha").foreach { key =>
      val draws = Seq(u("dp|", key), u("dp|sum:tok|", key),
        u("dp|topk|", key))
      assert(draws.distinct.size == 3,
        s"noise domains must not share a uniform for key $key: $draws")
    }
  }

  test("a key component containing the reserved '|' separator raises") {
    val df = Seq(("a|b", 1L), ("c", 2L)).toDF("g", "v")
    val ex = intercept[Exception] {
      Privacy.noisyCounts(df, Seq("g"), eps = 1.0, minRelease = -100L)
        .collect()
    }
    assert(ex.getMessage.contains("reserved '|' separator") ||
      Option(ex.getCause).exists(_.getMessage
        .contains("reserved '|' separator")))
  }
}

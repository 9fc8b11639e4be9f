package graft.text

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

class DsirSpec extends SparkSpec {

  /** Local twin of the distributed feature hashing: Spark-exact
    * tokens (ShingleKernels.sparkTokens replicates trim/split
    * semantics), 52-bit md5-prefix bucket hash — the same derivation
    * Dsir.features performs in Columns. */
  private def localFeatures(text: String, buckets: Int): Seq[Int] = {
    def h(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.map(b => f"$b%02x").mkString.substring(0, 13), 16)
    }
    val toks = graft.functions.ShingleKernels
      .sparkTokens(UTF8String.fromString(text)).toSeq
    val uni = toks.map(t => math.floorMod(h(t), buckets.toLong).toInt)
    val bi =
      if (toks.length < 2) Seq.empty
      else toks.sliding(2).map(p =>
        math.floorMod(h(p.mkString(" ")), buckets.toLong).toInt).toSeq
    uni ++ bi
  }

  test("distributed score equals exact local recomputation (real corpus)") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val b = 1024
    val target = docs.where(col("doc_id") < 25)
    val wts = Dsir.weightsMicroNats(
      Dsir.bucketCounts(target, "text", b),
      Dsir.bucketCounts(docs, "text", b))
    val got = Dsir.score(docs.where(col("doc_id") < 40), "text", "doc_id",
        wts, b)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    val texts = docs.where(col("doc_id") < 40)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(texts.nonEmpty)
    texts.foreach { case (id, text) =>
      val f = localFeatures(text, b)
      val expect = (f.length, f.map(wts(_)).sum)
      assert(got(id) == expect, s"doc $id: got ${got(id)}, expect $expect")
    }
  }

  test("bucket counts match a local count over the same features") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a b c"), (2L, "a a"), (3L, "z")).toDF("doc_id", "text")
    val b = 64
    val got = Dsir.bucketCounts(df, "text", b)
    val local = new Array[Long](b)
    Seq("a b c", "a a", "z").foreach(t =>
      localFeatures(t, b).foreach(f => local(f) += 1))
    assert(got.toSeq == local.toSeq)
  }

  test("selection draws from the target domain") {
    val s = spark
    import s.implicits._
    // Two disjoint-vocabulary domains; the target set is pure alpha.
    // The per-token log ratio for beta vocabulary is strongly
    // negative (never in target), so beta scores sit tens of nats
    // below alpha — far outside Gumbel noise — and the selected set
    // must be entirely alpha.
    val alphaWords = Seq("river", "stone", "meadow", "willow", "heron")
    val betaWords = Seq("socket", "kernel", "buffer", "packet", "daemon")
    def doc(words: Seq[String], i: Int): String =
      (0 until 20).map(j => words((i + j) % words.length)).mkString(" ")
    val corpus = ((0 until 50).map(i => (i.toLong, doc(alphaWords, i))) ++
      (50 until 100).map(i => (i.toLong, doc(betaWords, i))))
      .toDF("doc_id", "text")
    val target = corpus.where(col("doc_id") < 10)
    val b = 512
    val wts = Dsir.weightsMicroNats(
      Dsir.bucketCounts(target, "text", b),
      Dsir.bucketCounts(corpus, "text", b))
    val picked = Dsir.resample(corpus, "text", "doc_id", wts, b, k = 20)
      .collect().map(_.getLong(0))
    assert(picked.length == 20)
    assert(picked.forall(_ < 50), s"beta docs selected: ${picked.filter(_ >= 50).toSeq}")
  }

  test("resampling is deterministic for a fixed seed") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val b = 1024
    val wts = Dsir.weightsMicroNats(
      Dsir.bucketCounts(docs.where(col("doc_id") < 25), "text", b),
      Dsir.bucketCounts(docs, "text", b))
    def run(): Seq[Long] =
      Dsir.resample(docs, "text", "doc_id", wts, b, k = 30, seed = "s1")
        .collect().map(_.getLong(0)).toSeq.sorted
    assert(run() == run())
  }
}

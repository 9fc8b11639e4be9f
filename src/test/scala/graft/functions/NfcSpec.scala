package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NfcSpec extends SparkSpec {
  import spark.implicits._

  private val cases = Seq(
    "plain ascii stays as is",
    "cafe\u0301",                 // e + combining acute -> \u00e9
    "u\u0308ber",                 // u + diaeresis -> \u00fc
    "\u1e9b\u0323",              // long s + dot above, then dot below
    "already composed caf\u00e9 \u00fcber",
    "\ud83d\ude00 emoji with cafe\u0301", // non-BMP + combining
    "A\u030a\u0301ngstrom",      // stacked combining marks
    "")

  test("kernel output equals java.text.Normalizer NFC on every case") {
    val got = cases.toDF("s")
      .select(col("s"), NfcNormalizeExpr.nfcNormalize(spark, col("s")))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { c =>
      assert(got(c) === Normalizer.normalize(c, Normalizer.Form.NFC),
        s"mismatch on ${c.take(20)}")
    }
  }

  test("decomposed and precomposed collapse to one md5 / dedup group") {
    val df = Seq((1L, "café"), (2L, "café")).toDF("id", "s")
    val hashes = df
      .select(md5(NfcNormalizeExpr.nfcNormalize(spark, col("s"))))
      .distinct().count()
    assert(hashes === 1L)
    // without normalization they are two different strings
    assert(df.select(md5(col("s"))).distinct().count() === 2L)
  }

  test("idempotent and null-safe") {
    val once = NfcNormalizeExpr.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("café"))
    val twice = NfcNormalizeExpr.compute(once)
    assert(once === twice)
    val out = Seq(Option("à"), None).toDF("s")
      .select(NfcNormalizeExpr.nfcNormalize(spark, col("s")))
      .collect()
    assert(out.count(_.isNullAt(0)) === 1)
  }
}

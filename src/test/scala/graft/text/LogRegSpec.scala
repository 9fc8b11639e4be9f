package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LogRegSpec extends SparkSpec {

  import spark.implicits._

  // Planted separable vocabularies (the NaiveBayesSpec fixture shape).
  private val pos = Seq("apple", "banana", "mango", "pear")
  private val neg = Seq("qubit", "neutrino", "boson", "quark")
  private val corpus = (0L until 60L).map { i =>
    val words =
      if (i % 2 == 0) pos ++ pos.take((i % 3).toInt + 1)
      else neg ++ neg.take((i % 3).toInt + 1)
    (i, (words ++ Seq("the", "of")).mkString(" "), i % 2 == 0)
  }

  test("training is bit-reproducible and loss decreases") {
    val df = corpus.toDF("doc_id", "text", "is_pos")
    val m1 = LogReg.train(df, "text", "doc_id", col("is_pos"), buckets = 64)
    val m2 = LogReg.train(df, "text", "doc_id", col("is_pos"), buckets = 64)
    assert(m1.bias == m2.bias && m1.weights == m2.weights,
      "same input must produce bit-identical weights")
    assert(m1.lossHistory.head > m1.lossHistory.last,
      s"loss did not decrease: ${m1.lossHistory.head} -> ${m1.lossHistory.last}")
    // Monotone-ish: final loss below every early-phase loss.
    assert(m1.lossHistory.takeRight(5).max <= m1.lossHistory.take(5).min)
  }

  test("separable classes are fully recovered; confusion is diagonal") {
    val df = corpus.toDF("doc_id", "text", "is_pos")
    val m = LogReg.train(df, "text", "doc_id", col("is_pos"), buckets = 64)
    val conf = LogReg.confusion(df, "text", col("is_pos"), m)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(conf.getOrElse((0L, 1L), 0L) == 0L, s"false positives: $conf")
    assert(conf.getOrElse((1L, 0L), 0L) == 0L, s"false negatives: $conf")
    assert(conf((0L, 0L)) + conf((1L, 1L)) == corpus.size.toLong)
  }

  test("distributed margin matches local recomputation on every doc") {
    val df = corpus.toDF("doc_id", "text", "is_pos")
    val b = 64
    val m = LogReg.train(df, "text", "doc_id", col("is_pos"), buckets = b)
    val got = df.select(col("doc_id"),
        LogReg.margin(col("text"), m).as("mg"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def bucket(w: String): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8"))
        .map(x => f"$x%02x").mkString.substring(0, 13)
      (java.lang.Long.parseLong(hex, 16) % b).toInt
    }
    corpus.foreach { case (id, text, _) =>
      val fs = text.trim.toLowerCase.split("\\s+", -1).toSeq.map(bucket)
      // Same left-to-right order as the aggregate expression.
      val s = fs.foldLeft(0.0)((acc, f) => acc + m.weights(f))
      val expect = m.bias + (if (fs.nonEmpty) s * b / fs.length else 0.0)
      assert(math.abs(got(id) - expect) < 1e-12,
        s"doc $id margin ${got(id)} != $expect")
    }
  }

  test("empty and whitespace-only documents produce finite margins") {
    // tokens("") is [""] under the split/trim semantics (split keeps
    // the empty segment), so even "empty" docs have one bucket — the
    // margin must still be finite and deterministic.
    val df = Seq((1L, "", true), (2L, "   ", false))
      .toDF("doc_id", "text", "is_pos")
    val m = LogReg.Model(4, 0.25, Seq(1.0, 2.0, 3.0, 4.0), Nil)
    val got = df.select(col("doc_id"), LogReg.margin(col("text"), m).as("mg"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.values.forall(v => !v.isNaN && !v.isInfinite))
    // "" and "   " tokenize identically -> identical margins.
    assert(got(1L) == got(2L))
  }
}

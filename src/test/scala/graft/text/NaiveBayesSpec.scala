package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NaiveBayesSpec extends SparkSpec {

  import spark.implicits._

  // Two planted vocabularies with a little shared noise — separable
  // by construction, so train/predict must recover the labels.
  private val fruit = Seq("apple", "banana", "mango", "pear")
  private val physics = Seq("qubit", "neutrino", "boson", "quark")
  private def doc(id: Long, words: Seq[String], label: String) =
    (id, (words ++ Seq("the", "of")).mkString(" "), label)
  private val corpus = (0L until 40L).map { i =>
    if (i % 2 == 0) doc(i, fruit ++ fruit.take((i % 3).toInt + 1), "a")
    else doc(i, physics ++ physics.take((i % 3).toInt + 1), "b")
  }

  test("train/predict recovers planted separable classes on held-out docs") {
    val df = corpus.toDF("doc_id", "text", "label")
    val model = NaiveBayes.train(
      df.where(col("doc_id") % 5 =!= 0), "text", "label", Seq("a", "b"), 256)
    val preds = NaiveBayes.predict(
      df.where(col("doc_id") % 5 === 0), "text", model)
      .select(col("label"), col("pred")).collect()
    assert(preds.nonEmpty)
    preds.foreach(r => assert(r.getString(0) == r.getString(1),
      s"misclassified: $r"))
  }

  test("distributed scores equal exact local recomputation") {
    val df = corpus.toDF("doc_id", "text", "label")
    val b = 256
    val model = NaiveBayes.train(df, "text", "label", Seq("a", "b"), b)
    val got = NaiveBayes.predict(df, "text", model)
      .select(col("doc_id"), col("s_a"), col("s_b"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def bucket(w: String): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8"))
        .map(x => f"$x%02x").mkString.substring(0, 13)
      (java.lang.Long.parseLong(hex, 16) % b).toInt
    }
    corpus.foreach { case (id, text, _) =>
      val fs = text.trim.toLowerCase.split("\\s+", -1).toSeq.map(bucket)
      val expect = (
        model.priorsMu(0) + fs.map(f => model.weightsMu(0)(f)).sum,
        model.priorsMu(1) + fs.map(f => model.weightsMu(1)(f)).sum)
      assert(got(id) == expect, s"doc $id: got ${got(id)}, expect $expect")
    }
  }

  test("argmax tie breaks to the first class in sorted order") {
    // Identical training text for both classes → identical weights;
    // equal doc counts → equal priors → every score ties → 'a'.
    val tied = Seq((1L, "x y z", "a"), (2L, "x y z", "b"),
      (3L, "x y z", "a"), (4L, "x y z", "b"))
    val df = tied.toDF("doc_id", "text", "label")
    val model = NaiveBayes.train(df, "text", "label", Seq("a", "b"), 64)
    val preds = NaiveBayes.predict(df, "text", model)
      .select(col("pred")).collect().map(_.getString(0))
    assert(preds.forall(_ == "a"))
  }
}

package graft.ops

import graft.SparkSpec

class FdrSpec extends SparkSpec {
  import spark.implicits._

  // 400 docs, label = first half. 5 planted "sigN" tokens are strongly
  // label-associated (present in 90% of labeled / 10% of unlabeled
  // docs); 15 "nulN" tokens split EXACTLY evenly across the label
  // (t_obs = 0 by construction); unique fillers keep df ranks clean.
  private lazy val planted = {
    val rows = (0 until 400).map { i =>
      val lbl = i < 200
      val sig = (0 until 5).filter { _ =>
        if (lbl) i % 10 != 0 else i % 10 == 0
      }.map(k => s"sig$k")
      val nul = (0 until 15).filter(j => (i + j) % 2 == 0)
        .map(j => s"nul$j")
      (i.toLong, lbl, (sig ++ nul ++ Seq(s"filler$i")).mkString(" "))
    }
    rows.toDF("doc_id", "lbl", "text")
  }

  test("planted mixture: strong associations discovered, exact nulls controlled") {
    val got = Fdr.tokenScreen(planted, m = 20, alphaBp = 2500L)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.size == 20)
    // the 20 candidates are exactly the planted tokens (fillers df=1)
    assert(got.keySet == ((0 until 5).map(k => s"sig$k") ++
      (0 until 15).map(j => s"nul$j")).toSet)
    // every strong association is discovered at the minimum p
    (0 until 5).foreach { k =>
      val (t, p, s) = got(s"sig$k")
      assert(s == 1L, s"sig$k must be significant: t=$t p=$p")
      assert(t >= 7000L, s"sig$k gap $t")
      assert(p == 10000L / 33L, s"sig$k p $p")
    }
    // every exact null has t_obs = 0 and is NOT discovered
    (0 until 15).foreach { j =>
      val (t, _, s) = got(s"nul$j")
      assert(t == 0L, s"nul$j t_obs $t")
      assert(s == 0L, s"nul$j must not be significant")
    }
    // determinism: identical on a repartitioned rerun
    val again = Fdr.tokenScreen(planted.repartition(7), m = 20,
      alphaBp = 2500L).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(again == got)
  }

  test("alpha = 0 discovers nothing; a label-free corpus discovers nothing") {
    val none = Fdr.tokenScreen(planted, m = 20, alphaBp = 0L).collect()
    assert(none.forall(_.getLong(3) == 0L))
    val shuffledLbl = planted.drop("lbl")
      .withColumn("lbl", org.apache.spark.sql.functions.lit(false))
    val flat = Fdr.tokenScreen(shuffledLbl, m = 20, alphaBp = 2500L)
      .collect()
    // degenerate one-sided label: every rate gap is vs an empty side —
    // nothing may throw, and the output stays 20 well-formed rows
    assert(flat.length == 20)
  }
}

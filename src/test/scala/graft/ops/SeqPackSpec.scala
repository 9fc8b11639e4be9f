package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SeqPackSpec extends SparkSpec {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** 200 docs with lengths spread across the buckets, including a few
    * longer than the largest bucket. */
  private lazy val toks = {
    val s = spark
    import s.implicits._
    (0 until 200).map { i =>
      (i.toLong, (i * 37 % 600 + 5).toLong)
    }.toDF("doc_id", "tok")
  }

  private val buckets = Seq(32L, 64L, 128L, 256L, 512L)
  private val budget = 512L

  test("per-bucket slots are an exact prefix-packing of the md5 order") {
    val packed = SeqPack.pack(toks, "doc_id", "tok", seed = 7L,
      budget = budget, buckets = buckets)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("tok"),
        r.getAs[Long]("bucket_w"), r.getAs[Long]("batch_idx"),
        r.getAs[Long]("slot")))
    assert(packed.length == 200)
    // recompute the expected assignment locally from first principles
    val expected = packed.toSeq.map { case (id, tok, _, _, _) =>
        val w = buckets.find(tok <= _).getOrElse(buckets.last)
        (id, tok, w)
      }
      .groupBy(_._3).toSeq.flatMap { case (w, rows) =>
        val dpb = budget / w
        rows.sortBy { case (id, _, _) => (md5hex(s"7|$id"), id) }
          .zipWithIndex.map { case ((id, tok, _), p) =>
            (id, tok, w, p / dpb, p % dpb)
          }
      }.toSet
    assert(packed.toSet == expected)
  }

  test("every batch is full except the last per bucket; footprint ≤ budget") {
    val packed = SeqPack.pack(toks, "doc_id", "tok", seed = 7L,
      budget = budget, buckets = buckets)
    val batches = packed.groupBy(col("bucket_w"), col("batch_idx"))
      .agg(count(lit(1)).as("n"), max(col("tok")).as("max_tok"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    batches.groupBy(_._1).foreach { case (w, bs) =>
      val dpb = budget / w
      val lastIdx = bs.map(_._2).max
      bs.foreach { case (_, idx, n, maxTok) =>
        if (idx < lastIdx) assert(n == dpb, s"bucket $w batch $idx has $n/$dpb")
        else assert(n <= dpb)
        // every member pads to bucket_w, so the padded footprint is
        // n * w ≤ budget; oversize docs live alone in the last bucket
        if (w < buckets.last) assert(maxTok <= w)
        assert(n * w <= budget)
      }
    }
  }

  test("deterministic across runs; seed changes the packing") {
    val a = SeqPack.pack(toks, "doc_id", "tok", seed = 7L,
      budget = budget, buckets = buckets).collect().toSeq
    val b = SeqPack.pack(toks, "doc_id", "tok", seed = 7L,
      budget = budget, buckets = buckets).collect().toSeq
    assert(a.toSet == b.toSet)
    val c = SeqPack.pack(toks, "doc_id", "tok", seed = 8L,
      budget = budget, buckets = buckets).collect().toSeq
    assert(a.toSet != c.toSet)
  }
}

package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GridPqSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("distributed encode equals the driver-side per-subspace argmin") {
    val emb = graft.Tables.embeddings(spark, dir)
    val model = GridPq.train(emb, "embedding", "vec_id",
      m = 8, ksub = 16, iters = 2, maxTrain = 128)
    assert(model.dsub == 8 && model.codebooks.length == 8)
    assert(model.codebooks.forall(_.length == 16))
    val got = GridPq.encode(emb, "embedding", "vec_id", model)
      .collect()
      .map(r => r.getLong(0) -> (1 to 8).map(j => r.getLong(j)).toSeq)
      .toMap
    val qv = emb.select(col("vec_id").cast("long"),
        GridKmeans.quantize(col("embedding")))
      .as[(Long, Array[Long])].collect()
    qv.foreach { case (id, v) =>
      val want = (0 until 8).map { j =>
        val sub = v.slice(j * 8, (j + 1) * 8)
        model.codebooks(j).zipWithIndex.map { case (cw, k) =>
          val d = sub.zip(cw).map { case (a, b) => (a - b) * (a - b) }.sum
          (d * 16 + k, k.toLong)
        }.min._2
      }
      assert(got(id) == want, s"vec $id")
    }
  }

  test("ADC total is exactly the sum of per-subspace code distances") {
    val emb = graft.Tables.embeddings(spark, dir)
    val rest = emb.where(col("vec_id") =!= 0)
    val model = GridPq.train(rest, "embedding", "vec_id",
      m = 8, ksub = 16, iters = 2, maxTrain = 128)
    val enc = GridPq.encode(rest, "embedding", "vec_id", model)
      .localCheckpoint(true)
    val q0 = GridKmeans.quantizeVec(
      emb.where(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"))
        .head().getSeq[Double](0).toArray)
    val top = GridPq.adcTopK(enc, "vec_id", q0, model, k = 20)
      .as[(Long, Long)].collect()
    val codes = enc.collect()
      .map(r => r.getLong(0) -> (1 to 8).map(j => r.getLong(j)).toArray)
      .toMap
    top.foreach { case (id, adc) =>
      val want = (0 until 8).map { j =>
        val sub = q0.slice(j * 8, (j + 1) * 8)
        val cw = model.codebooks(j)(codes(id)(j).toInt)
        sub.zip(cw).map { case (a, b) => (a - b) * (a - b) }.sum
      }.sum
      assert(adc == want, s"vec $id")
    }
    // ascending, ties by id — the declared order
    assert(top.sortBy(t => (t._2, t._1)).toSeq == top.toSeq)
  }
}

package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization on the integer grid — the ORACLE-EXACT twin of
  * [[Pq]]'s float codebooks, completing the grid-twin family
  * (clustering → [[GridKmeans]], SemDeDup, IVF, now the compressed
  * tier).
  *
  * Recipe unchanged from float PQ: split the vector into `m`
  * subspaces, k-means each subspace to `ksub` codewords, store one
  * byte-ish code per subspace, answer queries by ADC — a per-subspace
  * lookup table of query-to-codeword distances summed over subspaces.
  * What the grid buys: every codebook entry, code, LUT cell, and ADC
  * total is an exact integer (floor-once 10⁶ quantization + the
  * [[GridKmeans]] truncating-mean loop), so a SQL engine can retrain
  * all `m` codebooks, re-encode the corpus, rebuild the LUTs, and
  * replay the ranking bit-for-bit.
  *
  * Scale shape, same as float PQ: ONE bounded sample collect feeds all
  * m codebook trainings (driver loops over sample slices — never m
  * sampling jobs); encoding is one distributed pass with the codebooks
  * as literals; ADC reads only codes + a literal LUT (the compressed
  * tier never touches raw vectors at query time).
  */
object GridPq {

  /** codebooks(j)(k) = codeword k of subspace j, dsub ints each. */
  final case class Model(m: Int, dsub: Int,
      codebooks: Array[Array[Array[Long]]])

  def train(corpus: DataFrame, vecCol: String, idCol: String,
      m: Int, ksub: Int, iters: Int, maxTrain: Int): Model = {
    val sample = GridKmeans.collectSample(corpus, vecCol, idCol, maxTrain)
    val dim = sample(0)._2.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    val books = (0 until m).toArray.map { j =>
      GridKmeans.kmeansOnGrid(
        sample.map { case (id, v) => (id, v.slice(j * dsub, (j + 1) * dsub)) },
        ksub, iters)
    }
    Model(m, dsub, books)
  }

  /** One distributed encode pass: per subspace, argmin integer
    * distance to its codewords (packed dist·ksub+code tie rule),
    * codebooks riding as literals. Output: (idCol, code_0..code_m-1). */
  def encode(corpus: DataFrame, vecCol: String, idCol: String,
      model: Model): DataFrame = {
    val ksub = model.codebooks(0).length
    val withQv = corpus.withColumn("__qv", GridKmeans.quantize(col(vecCol)))
    val codeCols: Seq[Column] = (0 until model.m).map { j =>
      val sub = slice(col("__qv"), lit(j * model.dsub + 1), lit(model.dsub))
      val packed = model.codebooks(j).zipWithIndex.toSeq.map { case (cw, k) =>
        aggregate(zip_with(sub, typedLit(cw.toSeq),
          (a, b) => (a - b) * (a - b)), lit(0L), (acc, x) => acc + x) *
          lit(ksub.toLong) + lit(k.toLong)
      }
      pmod(least(packed: _*), lit(ksub.toLong)).as(s"code_$j")
    }
    withQv.select(col(idCol) +: codeCols: _*)
  }

  /** ADC top-k for one quantized query over an encoded corpus: the
    * per-subspace LUTs are driver integers riding as literal arrays;
    * the scan touches codes only. Ascending distance, ties by id. */
  def adcTopK(encoded: DataFrame, idCol: String, queryQv: Array[Long],
      model: Model, k: Int): DataFrame = {
    val luts: Array[Seq[Long]] = (0 until model.m).toArray.map { j =>
      val qSub = queryQv.slice(j * model.dsub, (j + 1) * model.dsub)
      model.codebooks(j).toSeq.map { cw =>
        var d = 0L; var i = 0
        while (i < model.dsub) { val t = qSub(i) - cw(i); d += t * t; i += 1 }
        d
      }
    }
    val adc = (0 until model.m).map { j =>
      element_at(typedLit(luts(j)), col(s"code_$j").cast("int") + lit(1))
    }.reduce(_ + _)
    encoded.select(col(idCol), adc.as("adc_q"))
      .orderBy(asc("adc_q"), asc(idCol))
      .limit(k)
  }
}

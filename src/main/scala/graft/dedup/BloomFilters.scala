package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Bloom filter over a string key column, built and probed
  * entirely with Column arithmetic — no UDF, no driver-side hashing of
  * corpus rows.
  *
  * Why it exists: [[Dedup.contaminated]] broadcasts the benchmark's
  * distinct shingles as STRINGS. That is the right plan while the eval
  * set is small, but a decontamination screen against a large
  * held-out suite (every benchmark the lab must exclude — easily 10⁸
  * distinct n-grams) cannot broadcast gigabytes of strings. The Bloom
  * filter compresses membership to m BITS (1.2 GB of shingle strings →
  * ~120 MB of bits at 1% fp for 10⁸ keys), restoring the
  * broadcast-sized prefilter; the (rare) false positives are removed by
  * an exact confirm join that only the SURVIVORS pay for. Net shuffle:
  * corpus text never moves, only the ~fp-fraction of corpus shingles
  * that pass the bits.
  *
  * Layout: m bits as Array[Long] words (word = bit >>> 6). k probes
  * use Kirsch–Mitzenmacher double hashing: pos_j = (h1 + j·h2) mod m
  * with h1 = xxhash64(key), h2 = xxhash64(key, 1). All mod-m arithmetic
  * is done on values already reduced mod m, so it cannot overflow under
  * ANSI mode for any m ≤ 2^31.
  *
  * Build is distributed end-to-end: shingle → k positions (explode) →
  * word index + bit mask → groupBy(word) + bit_or — ONE partial+final
  * aggregate whose output is at most m/64 rows regardless of key count.
  * Only the finished words (m/64 longs — the filter itself) reach the
  * driver.
  */
object BloomFilters {

  final case class Bloom(words: Array[Long], numBits: Long, k: Int) {
    /** Membership probe through the native kernel
      * ([[graft.functions.BloomProbeExpr]]): the key hashes ONCE and
      * the k positions walk in a loop — vs 2k full string hashes for
      * the Column form below (conjuncts don't share subexpressions in
      * FilterExec). False positive rate ≈ (1 - e^{-kn/m})^k; never a
      * false negative. */
    def mightContain(spark: org.apache.spark.sql.SparkSession,
        key: Column): Column =
      graft.functions.BloomProbeExpr.mightContain(spark, key, words,
        numBits, k)

    /** Declarative reference twin of the kernel probe (bit-equivalence
      * asserted in DedupSpec). */
    def mightContainColumns(key: Column): Column = {
      val wordsLit = typedLit(words.toSeq)
      (0 until k).map { j =>
        val pos = probePos(key, j, numBits)
        val word = element_at(wordsLit,
          (shiftrightunsigned(pos, 6) + lit(1L)).cast("int"))
        // shift distance is a Column → route through call_function
        // (the Scala-API overload takes Int only).
        call_function("shiftrightunsigned", word,
          pos.bitwiseAND(lit(63L)).cast("int"))
          .bitwiseAND(lit(1L)) === lit(1L)
      }.reduce(_ && _)
    }
  }

  /** j-th probe bit position for a key, all arithmetic pre-reduced mod
    * numBits so `h1m + j*h2m` stays ≤ (j+1)·numBits < 2^63 (no ANSI
    * overflow). */
  private def probePos(key: Column, j: Int, numBits: Long): Column = {
    val h1m = pmod(xxhash64(key), lit(numBits))
    val h2m = pmod(xxhash64(key, lit(1)), lit(numBits))
    pmod(h1m + lit(j.toLong) * h2m, lit(numBits))
  }

  /** Optimal parameter choice for n expected keys at the target false
    * positive rate: m = -n ln p / (ln 2)², k = (m/n) ln 2. */
  def sizeFor(expectedKeys: Long, fpp: Double): (Long, Int) = {
    require(expectedKeys > 0 && fpp > 0 && fpp < 1)
    val ln2 = math.log(2)
    val m = math.max(64L,
      math.ceil(-expectedKeys * math.log(fpp) / (ln2 * ln2)).toLong)
    val mAligned = (m + 63) / 64 * 64
    val k = math.max(1, math.round(mAligned.toDouble / expectedKeys * ln2).toInt)
    (mAligned, k)
  }

  /** Build the filter from a DataFrame column of keys. The aggregation
    * output is bounded by m/64 rows (one per word that has any bit
    * set), so the collect is the size of the filter, independent of
    * key count. */
  def build(keys: DataFrame, keyCol: String, expectedKeys: Long,
      fpp: Double = 0.01): Bloom = {
    val (numBits, k) = sizeFor(expectedKeys, fpp)
    val positions = keys.select(
      explode(array((0 until k).map(j =>
        probePos(col(keyCol), j, numBits)): _*)).as("pos"))
    val words = positions
      .select(shiftrightunsigned(col("pos"), 6).as("word_idx"),
        call_function("shiftleft", lit(1L),
          col("pos").bitwiseAND(lit(63L)).cast("int")).as("mask"))
      .groupBy(col("word_idx"))
      .agg(bit_or(col("mask")).as("word"))
      .collect()
    val arr = new Array[Long]((numBits / 64).toInt)
    words.foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    Bloom(arr, numBits, k)
  }
}

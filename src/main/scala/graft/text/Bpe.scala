package graft.text

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary induction + distributed tokenization —
  * the real version of the "BPE-ish" token-budget heuristic used
  * elsewhere. Follows the package's standard split for iterative
  * algorithms (same recipe as the IVF/PQ trainers):
  *
  *   - TRAIN runs driver-side on a BOUNDED deterministic sample
  *     (TakeOrderedAndProject by hashed id): BPE's merge loop is
  *     inherently sequential — each merge depends on the last — so
  *     distributing it would serialize the cluster behind n tiny
  *     jobs. On a bounded sample the loop costs milliseconds and the
  *     merge table is KBs.
  *   - APPLY is ONE distributed pass: the learned table is prepared
  *     into a rank map once at plan-build time and embedded in
  *     codegen ([[graft.functions.BpeKernels]]); per row the kernel
  *     walks symbols — no per-row table parsing, no shuffle.
  *
  * Merge selection is deterministic: highest pair count, ties to the
  * lexicographically smallest pair. Application (both in training and
  * in the kernel) merges the chosen pair left-to-right without
  * overlap, which is exactly what the kernel's repeated
  * lowest-rank-leftmost rule produces — the equivalence the spec
  * asserts.
  */
object Bpe {

  /** Learned merges, rank order: element i is "left right". */
  def train(df: DataFrame, textCol: String, idCol: String, nMerges: Int,
      maxTrainDocs: Int = 4096): Seq[String] = {
    val spark = df.sparkSession
    import spark.implicits._
    val texts: Array[String] = df
      .orderBy(xxhash64(col(idCol)), col(idCol))
      .limit(maxTrainDocs)
      .select(col(textCol).cast("string"))
      .as[String].collect()
    trainTexts(texts, nMerges)
  }

  /** [[train]] with the REPLAYABLE md5-rank sample rule (the
    * GridKmeans sample rule: ORDER BY substring(md5(id::string),1,13),
    * id) instead of xxhash64, which DuckDB lacks — a paired oracle can
    * retrain the vocabulary bit-for-bit (q_vocab_bpe_twin). */
  def trainMd5(df: DataFrame, textCol: String, idCol: String,
      nMerges: Int, maxTrainDocs: Int): Seq[String] = {
    val spark = df.sparkSession
    import spark.implicits._
    val texts: Array[String] = df
      .orderBy(substring(md5(col(idCol).cast("string")), 1, 13),
        col(idCol))
      .limit(maxTrainDocs)
      .select(col(textCol).cast("string"))
      .as[String].collect()
    trainTexts(texts, nMerges)
  }

  /** The sequential merge loop over an already-collected bounded
    * sample (shared by both sample rules). */
  private[text] def trainTexts(texts: Array[String],
      nMerges: Int): Seq[String] = {
    // word frequency dictionary — BPE statistics are over word types
    // weighted by occurrence count
    val wordFreq = new mutable.HashMap[String, Long]()
    texts.foreach { t =>
      // same tokenization as the apply kernel (ShingleKernels
      // .sparkTokens); empty edge tokens carry no symbols, so they
      // contribute nothing to training either
      graft.functions.ShingleKernels
        .sparkTokens(org.apache.spark.unsafe.types.UTF8String.fromString(t))
        .foreach { w =>
          if (w.nonEmpty) wordFreq(w) = wordFreq.getOrElse(w, 0L) + 1L
        }
    }
    // seed symbols by CODE POINT (shared with the kernel) — char-wise
    // seeding would split surrogate pairs on non-BMP text
    var seqs: Array[(Array[String], Long)] =
      wordFreq.toArray.sortBy(_._1).map { case (w, f) =>
        (graft.functions.BpeKernels.seedSymbols(w), f)
      }
    val merges = Seq.newBuilder[String]
    var m = 0
    var exhausted = false
    while (m < nMerges && !exhausted) {
      val counts = new mutable.HashMap[String, Long]()
      seqs.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = syms(i) + " " + syms(i + 1)
          counts(p) = counts.getOrElse(p, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        // deterministic argmax: max count, then smallest pair string
        // in CODE-POINT order (≡ DuckDB's UTF-8 byte ORDER BY) — JVM
        // String compareTo is UTF-16 code-unit order, which ranks
        // U+E000..U+FFFF ABOVE non-BMP code points and would diverge
        // the oracle twin on such a count tie
        val (best, bestC) = counts.toArray
          .reduceLeft { (u, v) =>
            if (v._2 > u._2 ||
              (v._2 == u._2 && codePointCompare(v._1, u._1) < 0)) v
            else u
          }
        if (bestC < 2) exhausted = true // merging singletons adds nothing
        else {
          merges += best
          val Array(a, b) = best.split(" ", 2)
          seqs = seqs.map { case (syms, f) => (applyMerge(syms, a, b), f) }
          m += 1
        }
      }
    }
    merges.result()
  }

  /** Code-point lexicographic compare (≡ UTF-8 byte order, the order
    * DuckDB's string ORDER BY uses) — differs from String.compareTo
    * exactly when one side contains a surrogate pair (non-BMP). */
  private[text] def codePointCompare(x: String, y: String): Int = {
    var i = 0; var j = 0
    while (i < x.length && j < y.length) {
      val cx = x.codePointAt(i); val cy = y.codePointAt(j)
      if (cx != cy) return Integer.compare(cx, cy)
      i += Character.charCount(cx); j += Character.charCount(cy)
    }
    Integer.compare(x.length - i, y.length - j)
  }

  /** Left-to-right non-overlapping application of one merge — the
    * same result the kernel's repeated leftmost-lowest-rank rule
    * yields for a single pair. */
  private[text] def applyMerge(syms: Array[String], a: String,
      b: String): Array[String] = {
    val out = mutable.ArrayBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += a + b
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toArray
  }

  /** Distributed token count under the learned merges. */
  def tokenCount(spark: SparkSession, text: Column,
      merges: Seq[String]): Column =
    graft.functions.BpeExprs.bpeCount(spark, text, merges)

  /** Distributed tokenization (one ARRAY<STRING> per row). */
  def tokenize(spark: SparkSession, text: Column,
      merges: Seq[String]): Column =
    graft.functions.BpeExprs.bpeTokenize(spark, text, merges)
}

package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ByteEntropySpec extends SparkSpec {
  import spark.implicits._

  /** The declarative hex chain — the ORACLE's shape, in Spark — that
    * the kernel must match bit for bit: hex(bytes) → 2-char classes →
    * per-class counts → floor-once terms → integer sum. */
  private def declarative(df: org.apache.spark.sql.DataFrame) = {
    val pairs = split(
      regexp_replace(hex(encode(col("text"), "UTF-8")), "(..)", "$1,"),
      ",")
    df.select(col("doc_id"),
        octet_length(col("text")).cast("long").as("n"),
        explode(pairs).as("b2"))
      .where(col("b2") =!= "")
      .groupBy(col("doc_id"), col("n"), col("b2"))
      .agg(count(lit(1)).as("k"))
      .groupBy(col("doc_id"))
      .agg(sum(expr(
        """CAST(floor((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
          |  * ln(CAST(n AS DOUBLE) / CAST(k AS DOUBLE))
          |  * 1000000.0) AS BIGINT)""".stripMargin)).as("h"))
  }

  test("kernel equals the declarative hex chain on the real corpus") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val kern = docs.select(col("doc_id"),
      ByteEntropyExpr.byteEntropyMicro(spark, col("text")).as("kh"))
    val decl = declarative(docs).withColumnRenamed("h", "dh")
    assert(kern.join(decl, Seq("doc_id"))
      .where(col("kh") =!= col("dh")).count() == 0)
    assert(kern.count() == decl.count())
  }

  test("bands: constant text near 0, uniform bytes near the 8-bit rate") {
    val repetitive = "aaaa" * 200
    val noise = (0 until 1024).map(i =>
      ((i * 7 + 13) % 94 + 33).toChar).mkString // printable pseudo-noise
    val df = Seq((1L, repetitive), (2L, noise), (3L, "normal prose text"))
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        ByteEntropyExpr.byteEntropyMicro(spark, col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 0L, s"single-byte text must score 0: ${got(1L)}")
    // 94 near-uniform printable classes: ln(94) ≈ 4.54 nats/byte
    assert(got(2L) > 4400000L, s"noise entropy too low: ${got(2L)}")
    assert(got(3L) > 0L && got(3L) < got(2L))
    // empty text: kernel 0, declarative absent — callers filter n>0
    val e = Seq((9L, "")).toDF("doc_id", "text")
    assert(e.select(ByteEntropyExpr.byteEntropyMicro(spark, col("text")))
      .collect()(0).getLong(0) == 0L)
    assert(declarative(e).count() == 0L)
  }

  test("order-0 bound vs zlib: repetitive text compresses BELOW it") {
    // duplicated SPANS: order-0 sees a prose-like byte histogram while
    // LZ matches crush it — exactly why the Deflater tier remains the
    // production signal and this twin is the declared order-0 bound
    val span = "the quick brown fox jumps over the lazy dog "
    val dup = span * 40
    val df = Seq((1L, dup)).toDF("doc_id", "text")
    val h = df.select(
      ByteEntropyExpr.byteEntropyMicro(spark, col("text")).as("h"))
      .collect()(0).getLong(0)
    val boundBp = h * 10000L / 5545177L
    val zlibBp = df.select(
      (DeflateSizeExpr.deflateSize(spark, col("text")).cast("long")
        * 10000L).as("zn"),
        octet_length(col("text")).cast("long").as("nb"))
      .selectExpr("zn div nb AS z") // Column./ on longs is double div
      .collect()(0).getLong(0)
    assert(zlibBp < boundBp,
      s"zlib ($zlibBp bp) must beat order-0 ($boundBp bp) on dup spans")
    assert(boundBp > 3000L, "order-0 sees prose-like byte mix")
  }
}

package graft.reports

import org.apache.spark.sql.{DataFrame, Row}

/** Report renderers (reference reports.go + tsv.go:18-57,
  * json.go:16-39, markdown.go:32-371): format ALREADY-LIMITED frames
  * (top-N rows, single-row totals) for humans/tools. Collect happens
  * here and only here — inputs are bounded by construction (K8:
  * compute-N ≤ 2000 rows), so driver-side rendering is safe.
  */
object Reports {

  def tsv(df: DataFrame): String = {
    val header = df.columns.mkString("\t")
    val rows = df.collect().map(r => (0 until r.length).map(fmt(r, _)).mkString("\t"))
    (header +: rows).mkString("\n")
  }

  /** JSON-lines, one object per row (reference json.go:16-39). */
  def jsonLines(df: DataFrame): String =
    df.toJSON.collect().mkString("\n")

  def markdown(df: DataFrame, title: String): String = {
    val cols = df.columns
    val sb = new StringBuilder(s"## $title\n\n")
    sb.append(cols.mkString("| ", " | ", " |\n"))
    sb.append(cols.map(_ => "---").mkString("| ", " | ", " |\n"))
    df.collect().foreach { r =>
      sb.append((0 until r.length).map(fmt(r, _)).mkString("| ", " | ", " |\n"))
    }
    sb.toString
  }

  /** Human size units, decimal or binary (reference main.go:175-188). */
  def formatSize(bytes: Long, binary: Boolean = false): String = {
    val unit = if (binary) 1024L else 1000L
    val prefixes = if (binary) Seq("", "Ki", "Mi", "Gi", "Ti", "Pi")
    else Seq("", "K", "M", "G", "T", "P")
    if (bytes < unit) s"$bytes B"
    else {
      var v = bytes.toDouble
      var i = 0
      while (v >= unit && i < prefixes.length - 1) { v /= unit; i += 1 }
      f"$v%.1f ${prefixes(i)}B"
    }
  }

  private def fmt(r: Row, i: Int): String =
    Option(r.get(i)).map(_.toString).getOrElse("")
}

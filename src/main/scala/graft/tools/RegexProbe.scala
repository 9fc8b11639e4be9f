package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: pin down Spark 4's regexp \b word-char semantics and
  * lower() expansion behavior (used to make LangIdExpr's kernel match
  * the declarative regexp_count form exactly). */
object RegexProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def q(sql: String): Unit =
      println(sql + "  =>  " + spark.sql(sql).collect()(0).toString)
    q("""SELECT regexp_count('éand', '\\band\\b')""")
    q("""SELECT regexp_count('ßis', '\\bis\\b')""")
    q("""SELECT regexp_count('x7the', '\\bthe\\b')""")
    q("""SELECT regexp_count('_the', '\\bthe\\b')""")
    q("""SELECT regexp_count('中the', '\\bthe\\b')""")
    q("""SELECT regexp_count('i̇the', '\\bthe\\b')""")
    q("""SELECT lower('wCİthe')""")
    q("""SELECT length(lower('İ'))""")
    q("""SELECT regexp_count(lower('wCİthe'), '\\bthe\\b')""")
    // \s width: ASCII-only or Unicode White_Space?
    q("SELECT regexp_count('a b', '\\\\s')") // NBSP
    q("SELECT regexp_count('a b', '\\\\s')") // EM SPACE
    q("SELECT size(split('a b', '\\\\s+'))")
    q("""SELECT regexp_count('a b', '\\s')""")
    // \b at string edges with unicode letter
    q("""SELECT regexp_count('éthe', '\\bthe\\b')""")
    q("""SELECT regexp_count('theé', '\\bthe\\b')""")
    // Plain java.util.regex in the same JVM, for comparison.
    def j(text: String, pattern: String): Unit = {
      val m = java.util.regex.Pattern.compile(pattern).matcher(text)
      var c = 0; while (m.find()) c += 1
      println(s"java '$text' '$pattern' => $c")
    }
    j("i̇the", "\\bthe\\b")
    j("éthe", "\\bthe\\b")
    j("中the", "\\bthe\\b")
    j("a b", "\\s")
    spark.stop()
  }
}

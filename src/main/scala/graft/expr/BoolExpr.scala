package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's query language: a boolean predicate DSL over file
  * metadata (reference internal/boolexpr/expression.go:25-48), compiled
  * to a Catalyst [[Column]] expression tree instead of a per-row
  * interpreter. Precedence and grammar follow the reference's vendored
  * parser: `!` binds tightest, then `&&`, then `||`; parentheses group.
  *
  * Compiling to Columns (rather than evaluating per row) means the
  * predicate participates in Catalyst optimization — pushdown to the
  * parquet scan, constant folding, whole-stage codegen — which is what
  * makes the same filter viable at 100 TB.
  */
object BoolExpr {

  sealed trait Ast
  case class And(l: Ast, r: Ast) extends Ast
  case class Or(l: Ast, r: Ast) extends Ast
  case class Not(e: Ast) extends Ast
  case class Operand(name: String, value: String) extends Ast

  final case class ParseException(msg: String) extends RuntimeException(msg)

  /** Recursive-descent parser for `a=b && (c=d || !e=f)`.
    *
    * Tokens are whitespace-separated, like the reference CLI where each
    * operand/operator is its own argv element; we additionally split
    * `(`, `)`, `!`, `&&`, `||` that are glued to neighbors.
    */
  def parse(input: String): Option[Ast] = {
    val toks = tokenize(input)
    if (toks.isEmpty) None
    else {
      val p = new Parser(toks)
      val ast = p.parseOr()
      if (p.pos != toks.length)
        throw ParseException(s"trailing tokens at ${p.pos}: ${toks.drop(p.pos).mkString(" ")}")
      Some(ast)
    }
  }

  private def tokenize(s: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '(' || c == ')' || c == '!') { out += c.toString; i += 1 }
      else if ((c == '&' || c == '|') && i + 1 < n && s.charAt(i + 1) == c) {
        out += s.substring(i, i + 2); i += 2
      } else {
        // operand token: run to next whitespace or structural char
        val start = i
        while (i < n && !s.charAt(i).isWhitespace && s.charAt(i) != '(' && s.charAt(i) != ')'
          && !((s.charAt(i) == '&' || s.charAt(i) == '|') && i + 1 < n && s.charAt(i + 1) == s.charAt(i))) {
          i += 1
        }
        out += s.substring(start, i)
      }
    }
    out.result()
  }

  private final class Parser(toks: Vector[String]) {
    var pos = 0
    private def peek: Option[String] = if (pos < toks.length) Some(toks(pos)) else None
    private def next(): String = { val t = toks(pos); pos += 1; t }

    def parseOr(): Ast = {
      var l = parseAnd()
      while (peek.contains("||")) { next(); l = Or(l, parseAnd()) }
      l
    }
    def parseAnd(): Ast = {
      var l = parseUnary()
      while (peek.contains("&&")) { next(); l = And(l, parseUnary()) }
      l
    }
    def parseUnary(): Ast = peek match {
      case Some("!") => next(); Not(parseUnary())
      case Some("(") =>
        next()
        val e = parseOr()
        if (!peek.contains(")")) throw ParseException(s"expected ) at token $pos")
        next(); e
      case Some(tok) if tok != ")" && tok != "&&" && tok != "||" =>
        next()
        tok.split("=", 2) match {
          case Array(k, v) => Operand(k, v)
          case _ => throw ParseException(s"operand '$tok' is not name=value")
        }
      case other => throw ParseException(s"unexpected token $other at $pos")
    }
  }

  /** Compile an AST to a Column given an operand registry. */
  def compile(ast: Ast, operands: String => String => Column): Column = ast match {
    case And(l, r) => compile(l, operands) && compile(r, operands)
    case Or(l, r) => compile(l, operands) || compile(r, operands)
    case Not(e) => !compile(e, operands)
    case Operand(name, value) => operands(name)(value)
  }

  /** Parse + compile; empty expression compiles to `lit(emptyValue)`
    * (reference WithEmptyEntryValue, expression.go:93-97,124-136). */
  def compile(input: String, operands: String => String => Column,
      emptyValue: Boolean = true): Column =
    parse(input).map(compile(_, operands)).getOrElse(lit(emptyValue))

  /** Translate a shell glob (`*`, `?`, `[a-z]`, `{a,b}` unsupported as in
    * Go's path.Match) to an anchored Java regex for `rlike`. */
  def globToRegex(glob: String): String = {
    val sb = new StringBuilder("^")
    var i = 0
    while (i < glob.length) {
      glob.charAt(i) match {
        case '*' => sb.append("[^/]*")
        case '?' => sb.append("[^/]")
        case '[' =>
          val close = glob.indexOf(']', i + 1)
          if (close < 0) { sb.append("\\[") }
          else {
            var cls = glob.substring(i + 1, close)
            if (cls.startsWith("^")) cls = "\\^" + cls.drop(1)
            if (cls.startsWith("!")) cls = "^" + cls.drop(1)
            sb.append('[').append(cls).append(']')
            i = close
          }
        case c if "\\.[]{}()+-^$|".indexOf(c.toInt) >= 0 => sb.append('\\').append(c)
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append("$").toString
  }
}

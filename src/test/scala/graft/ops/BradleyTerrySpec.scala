package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class BradleyTerrySpec extends AnyFunSuite {

  test("symmetric duel gives equal ratings") {
    val r = BradleyTerry.ratings(Seq(("a", "b", 2L), ("b", "a", 2L)))
    val byItem = r.map(x => x._1 -> x._4).toMap
    assert(byItem("a") == byItem("b"))
    assert(r.map(_._1) == Seq("a", "b")) // sorted
    assert(r.forall(_._3 == 4L)) // both played 4 matches
  }

  test("dominance orders ratings; sweep drives the loser toward zero") {
    val r = BradleyTerry.ratings(Seq(("a", "b", 3L))).map(x => x._1 -> x._4).toMap
    assert(r("a") > r("b"))
    assert(r("b") == 0L) // W_b = 0 -> p_b = 0 after iteration 1
  }

  test("transitive strengths rank a > b > c") {
    val r = BradleyTerry.ratings(
      Seq(("a", "b", 3L), ("b", "a", 1L), ("b", "c", 3L), ("c", "b", 1L)))
      .map(x => x._1 -> x._4).toMap
    assert(r("a") > r("b") && r("b") > r("c"))
  }

  test("exact integer replay of the MM recursion on a 2-item duel") {
    // a beats b 3, b beats a 1: n_ab = 4, W_a = 3, W_b = 1.
    val S = 1000000000000L
    var pa = 1000000L; var pb = 1000000L
    for (_ <- 1 to 3) {
      val da = 4L * S / (pa + pb); val db = 4L * S / (pa + pb)
      val na = 3L * S / da; val nb = 1L * S / db
      pa = na; pb = nb
    }
    val got = BradleyTerry.ratings(Seq(("a", "b", 3L), ("b", "a", 1L)))
      .map(x => x._1 -> x._4).toMap
    assert(got("a") == pa && got("b") == pb)
  }

  test("duplicate win rows accumulate") {
    val once = BradleyTerry.ratings(Seq(("a", "b", 2L)))
    val twice = BradleyTerry.ratings(Seq(("a", "b", 1L), ("a", "b", 1L)))
    assert(once == twice)
  }
}

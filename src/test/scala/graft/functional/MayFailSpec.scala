package graft.functional

import org.scalatest.funsuite.AnyFunSuite

class MayFailSpec extends AnyFunSuite {

  test("Ok maps and flatMaps") {
    assert(Ok(2).map(_ * 3) == Ok(6))
    assert(Ok(2).flatMap(x => Ok(x + 1)) == Ok(3))
  }

  test("MayFail captures exceptions") {
    val r = MayFail[Int](throw new IllegalStateException("boom"))
    assert(r.isFailing)
    assert(r.getError.exists(_.getMessage == "boom"))
  }

  test("Fail short-circuits the chain") {
    var touched = false
    val r = for {
      a <- MayFail[Int](throw new RuntimeException("first"))
      b <- { touched = true; Ok(a + 1) }
    } yield b
    assert(r.isFailing && !touched)
    assert(r.getError.exists(_.getMessage == "first"))
  }

  test("IgnorableFail keeps composing; map carries the error, flatMap-to-Ok forgives it") {
    val e = new RuntimeException("soft")
    val mapped = IgnorableFail(e, 10).map(_ * 2)
    assert(mapped == IgnorableFail(e, 20))
    // reference semantics: a successful continuation drops the error
    assert(IgnorableFail(e, 10).flatMap(x => Ok(x * 2)) == Ok(20))
    // getOrElse quirk: default wins even though a value is carried
    assert(IgnorableFail(e, 10).getOrElse(99) == 99)
    assert(IgnorableFail(e, 10).get == 10)
  }

  test("ignoreWith downgrades Fail") {
    val r = MayFail[Int](throw new RuntimeException("x")).ignoreWith(99)
    assert(r.isFailing && r.get == 99)
  }

  test("for-comprehension happy path") {
    val r = for { a <- Ok(1); b <- Ok(2); c <- Ok(3) } yield a + b + c
    assert(r == Ok(6))
  }

  test("exception thrown inside flatMap body becomes Fail") {
    val r = Ok(1).flatMap(_ => throw new RuntimeException("inner"))
    assert(r.isFailing)
  }

  test("sequence stops at first Fail") {
    val e = new RuntimeException("nth")
    assert(MayFail.sequence(Seq(Ok(1), Ok(2))) == Ok(Vector(1, 2)))
    assert(MayFail.sequence(Seq(Ok(1), Fail(e), Ok(3))) == Fail(e))
  }

  test("orElse recovers Fail only") {
    assert(Fail(new RuntimeException).orElse(Ok(5)) == Ok(5))
    assert(Ok(1).orElse(Ok(5)) == Ok(1))
  }
}

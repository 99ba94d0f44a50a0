package graft

import graft.functions.TextSplitter
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}

class TextSplitterSpec extends AnyFunSuite {

  test("short text → single chunk") {
    val s = new TextSplitter(100, 20)
    assert(s.split("hello world") == Seq("hello world"))
  }

  test("empty/null → empty") {
    val s = new TextSplitter(100, 20)
    assert(s.split("") == Seq.empty)
    assert(s.split(null) == Seq.empty)
  }

  test("splits on paragraph boundary first") {
    val s = new TextSplitter(20, 5)
    val out = s.split("first paragraph\n\nsecond paragraph")
    assert(out == Seq("first paragraph", "second paragraph"))
  }

  test("greedy merge keeps chunks under size with overlap carry") {
    val s = new TextSplitter(10, 3)
    val out = s.split("aa bb cc dd ee")
    assert(out.forall(_.length <= 10))
    // overlap: consecutive chunks share a tail/head word
    assert(out == Seq("aa bb cc", "cc dd ee"))
  }

  test("oversized unbreakable run is recursed to character level") {
    val s = new TextSplitter(10, 2)
    val out = s.split("x" * 25)
    assert(out.forall(_.length <= 10))
    assert(out.mkString.contains("x" * 8)) // content preserved
  }

  test("fixed-size splitter geometry") {
    val out = TextSplitter.fixedSize("a" * 1000, 400, 100)
    assert(out.length == 3)
    assert(out.map(_.length) == Seq(400, 400, 400))
    assert(TextSplitter.fixedSize("a" * 50, 400, 100) == Seq("a" * 50))
  }

  test("property: chunks within size; every chunk is a substring; coverage") {
    val wordGen = Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    val textGen = for {
      n <- Gen.choose(0, 120)
      ws <- Gen.listOfN(n, wordGen)
      seps <- Gen.listOfN(n, Gen.oneOf(" ", " ", "\n", "\n\n"))
    } yield ws.zip(seps).map { case (w, s) => w + s }.mkString

    val splitter = new TextSplitter(50, 10)
    val prop = Prop.forAll(textGen) { text =>
      val chunks = splitter.split(text)
      chunks.forall(c => c.length <= 50 || !c.exists(ch => ch == ' ' || ch == '\n')) &&
        chunks.forall(c => text.contains(c))
    }
    val res = check(Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }
}

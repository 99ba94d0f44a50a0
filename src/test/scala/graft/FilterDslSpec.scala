package graft

import graft.functions.FilterDsl
import graft.functions.FilterDsl._
import org.scalatest.funsuite.AnyFunSuite

class FilterDslSpec extends AnyFunSuite {

  test("single condition") {
    assert(parse("""space = "ENG"""") == Cond("space", "=", "ENG"))
  }

  test("all operators") {
    for (op <- Seq("=", "!=", ">", ">=", "<", "<="))
      assert(parse(s"""f $op "v"""") == Cond("f", op, "v"))
  }

  test("and chain flattens into one group") {
    assert(parse("""a = "1" and b = "2" and c = "3"""") ==
      Group("and", Seq(Cond("a", "=", "1"), Cond("b", "=", "2"), Cond("c", "=", "3"))))
  }

  test("reference parity: left-associative, no precedence (filter_parser.py:64-77)") {
    // a = "1" or b = "2" and c = "3"  →  ((a or b) and c)
    assert(parse("""a = "1" or b = "2" and c = "3"""") ==
      Group("and", Seq(
        Group("or", Seq(Cond("a", "=", "1"), Cond("b", "=", "2"))),
        Cond("c", "=", "3"))))
  }

  test("standard precedence mode: and binds tighter") {
    assert(parse("""a = "1" or b = "2" and c = "3"""", standardPrecedence = true) ==
      Group("or", Seq(
        Cond("a", "=", "1"),
        Group("and", Seq(Cond("b", "=", "2"), Cond("c", "=", "3"))))))
  }

  test("parentheses override") {
    assert(parse("""(space = "A" or space = "B") and createdBy = "user@x.com"""") ==
      Group("and", Seq(
        Group("or", Seq(Cond("space", "=", "A"), Cond("space", "=", "B"))),
        Cond("createdBy", "=", "user@x.com"))))
  }

  test("escaped quotes in values") {
    assert(parse("""a = "x \" y"""") == Cond("a", "=", "x \" y"))
  }

  test("malformed inputs raise parse errors (FIXTURES.md §5)") {
    for (bad <- Seq("""space =""", """space = unquoted""", """(a = "1"""",
                    """= "v"""", """a = "1" and""", """a = "1" b = "2""""))
      assertThrows[ParseException](parse(bad))
  }

  test("toSql renders ANSI predicate") {
    assert(FilterDsl.toSql(parse("""a = "1" or b != "2"""")) == """(a = '1') OR (b <> '2')""")
  }

  // ------------------------------------------------- ScalaCheck properties

  import org.scalacheck.{Gen, Prop}
  import org.scalacheck.Test.{check, Parameters}

  private val genCond: Gen[Cond] = for {
    f <- Gen.identifier.map(_.take(8)).suchThat(s => s.nonEmpty && s != "and" && s != "or")
    op <- Gen.oneOf("=", "!=", ">", ">=", "<", "<=")
    v <- Gen.alphaNumStr.map(_.take(12))
  } yield Cond(f, op, v)

  private def genNode(depth: Int): Gen[Node] =
    if (depth <= 0) genCond
    else Gen.frequency(
      2 -> genCond,
      1 -> (for {
        op <- Gen.oneOf("and", "or")
        n <- Gen.choose(2, 3)
        cs <- Gen.listOfN(n, genNode(depth - 1))
      } yield Group(op, cs)))

  /** Render an AST back to DSL text with explicit parens (parse-safe in both
    * precedence modes).
    */
  private def render(n: Node): String = n match {
    case Cond(f, op, v) => s"""$f $op "${v.replace("\\", "\\\\").replace("\"", "\\\"")}""""
    case Group(op, cs)  => cs.map {
      case c: Cond => render(c)
      case g       => s"(${render(g)})"
    }.mkString(s" $op ")
  }

  private def runProp(p: Prop): Unit = {
    val r = check(Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  test("property: parse(render) is a stable normalization (idempotent)") {
    // Not syntactic identity: the left-assoc fold absorbs a parenthesized
    // same-op LEFT group (matching filter_parser.py's running fold), so parsing
    // normalizes. The normal form must be a fixed point.
    runProp(Prop.forAll(genNode(3)) { node =>
      val once = parse(render(node))
      parse(render(once)) == once
    })
  }

  test("property: parse never loses or reorders conditions") {
    def conds(n: Node): Seq[Cond] = n match {
      case c: Cond      => Seq(c)
      case Group(_, cs) => cs.flatMap(conds)
    }
    runProp(Prop.forAll(genNode(3)) { node =>
      conds(parse(render(node))) == conds(node)
    })
  }

  test("property: both precedence modes accept every rendered filter") {
    runProp(Prop.forAll(genNode(3)) { node =>
      val s = render(node)
      parse(s); parse(s, standardPrecedence = true) // must not throw
      true
    })
  }

  test("garbage fuzz: parse fails with ParseException only, never hangs or crashes") {
    val rnd = new scala.util.Random(20260813L)
    val alphabet = """ abc"'()=!<>and or x_1.\"""
    (1 to 500).foreach { _ =>
      val s = Seq.fill(rnd.nextInt(40))(alphabet(rnd.nextInt(alphabet.length))).mkString
      try { parse(s); parse(s, standardPrecedence = true) }
      catch { case _: FilterDsl.ParseException => /* the typed contract for bad input */ }
    }
  }
}

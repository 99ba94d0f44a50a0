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
}

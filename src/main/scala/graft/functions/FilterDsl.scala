package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType, StringType}

/** Metadata-filter DSL: tokenizer + recursive-descent parser + Column compiler.
  *
  * Grammar (reference: /root/reference/main/indexes/filter_parser.py:21-95):
  * {{{
  *   cond  := field op "value"         op ∈ { = != > >= < <= }
  *   expr  := term (("and"|"or") term)*
  *   term  := "(" expr ")" | cond
  * }}}
  *
  * The reference folds combinators LEFT-ASSOCIATIVELY with NO precedence:
  * `a or b and c` parses as `(a or b) and c` (filter_parser.py:64-77). We keep that
  * behavior by default for parity, and offer standard and-over-or precedence behind
  * `standardPrecedence = true`.
  *
  * Unlike the reference — which compiles the same AST into two divergent dialects
  * (epoch-int compare in Chroma, lexical ISO-string compare in SQLite:
  * chroma_indexer.py:98-101 vs sqllite_indexer.py:131-143) — we compile once to a
  * Spark [[Column]] and let the column's own type drive comparison semantics.
  */
object FilterDsl {

  sealed trait Node
  final case class Cond(field: String, op: String, value: String) extends Node
  final case class Group(op: String, children: Seq[Node]) extends Node // op ∈ {and, or}

  final case class ParseException(msg: String) extends RuntimeException(msg)

  // ---------------------------------------------------------------- tokenizer
  sealed trait Tok
  private case class TField(s: String) extends Tok
  private case class TOp(s: String) extends Tok
  private case class TVal(s: String) extends Tok
  private case class TComb(s: String) extends Tok
  private case object TLParen extends Tok
  private case object TRParen extends Tok

  private val tokenRe =
    """\s*(\(|\)|!=|>=|<=|=|>|<|"(?:[^"\\]|\\.)*"|[A-Za-z_][A-Za-z0-9_.]*)""".r

  def tokenize(input: String): List[Tok] = {
    val toks = scala.collection.mutable.ListBuffer.empty[Tok]
    var pos = 0
    while (pos < input.length) {
      tokenRe.findPrefixMatchOf(input.substring(pos)) match {
        case Some(m) if m.group(1) != null =>
          val t = m.group(1)
          toks += (t match {
            case "("                    => TLParen
            case ")"                    => TRParen
            case "=" | "!=" | ">" | ">=" | "<" | "<=" => TOp(t)
            case s if s.startsWith("\"") =>
              TVal(s.substring(1, s.length - 1).replace("\\\"", "\"").replace("\\\\", "\\"))
            case "and" | "or"           => TComb(t)
            case s                      => TField(s)
          })
          pos += m.end
        case _ =>
          if (input.substring(pos).trim.isEmpty) pos = input.length
          else throw ParseException(s"unexpected input at position $pos: '${input.substring(pos)}'")
      }
    }
    toks.toList
  }

  // ------------------------------------------------------------------ parser
  def parse(input: String, standardPrecedence: Boolean = false): Node = {
    val p = new Parser(tokenize(input), standardPrecedence)
    val node = p.parseExpr()
    if (p.hasNext) throw ParseException(s"trailing tokens after expression")
    node
  }

  private final class Parser(var toks: List[Tok], standardPrecedence: Boolean) {
    def hasNext: Boolean = toks.nonEmpty
    private def peek: Option[Tok] = toks.headOption
    private def next(): Tok = toks match {
      case h :: t => toks = t; h
      case Nil    => throw ParseException("unexpected end of input")
    }

    def parseExpr(): Node =
      if (standardPrecedence) parseOr() else parseFlat()

    // Reference parity: left-associative fold, no precedence; same-op runs flatten
    // into one Group (filter_parser.py:64-77).
    private def parseFlat(): Node = {
      var node = parseTerm()
      while (peek.exists(_.isInstanceOf[TComb])) {
        val TComb(op) = next(): @unchecked
        val rhs = parseTerm()
        node = node match {
          case Group(`op`, cs) => Group(op, cs :+ rhs)
          case other           => Group(op, Seq(other, rhs))
        }
      }
      node
    }

    // Standard precedence: or := and ("or" and)*
    private def parseOr(): Node = {
      var node = parseAnd()
      while (peek.contains(TComb("or"))) { next(); node = merge("or", node, parseAnd()) }
      node
    }
    private def parseAnd(): Node = {
      var node = parseTerm()
      while (peek.contains(TComb("and"))) { next(); node = merge("and", node, parseTerm()) }
      node
    }
    private def merge(op: String, l: Node, r: Node): Node = l match {
      case Group(`op`, cs) => Group(op, cs :+ r)
      case _               => Group(op, Seq(l, r))
    }

    private def parseTerm(): Node = next() match {
      case TLParen =>
        val inner = parseExpr()
        next() match {
          case TRParen => inner
          case t       => throw ParseException(s"expected ')' but found $t")
        }
      case TField(f) =>
        next() match {
          case TOp(op) => next() match {
            case TVal(v) => Cond(f, op, v)
            case t       => throw ParseException(s"expected quoted value but found $t")
          }
          case t => throw ParseException(s"expected operator but found $t")
        }
      case t => throw ParseException(s"expected condition or '(' but found $t")
    }
  }

  // ---------------------------------------------------------------- compiler
  /** Compile an AST to a Spark Column. When `schema` is given, literals are cast to
    * the referenced column's type so numeric/timestamp columns compare natively
    * (fixing the reference's epoch-vs-ISO divergence, SURVEY.md §1.2).
    */
  def compile(node: Node, schema: Option[StructType] = None,
              fieldCol: String => Column = col): Column = node match {
    case Cond(f, op, v) =>
      val c = fieldCol(f)
      val litType: DataType = schema.flatMap(s => s.find(_.name == f)).map(_.dataType)
        .getOrElse(StringType)
      val l = if (litType == StringType) lit(v) else lit(v).cast(litType)
      op match {
        case "="  => c === l
        case "!=" => c =!= l
        case ">"  => c > l
        case ">=" => c >= l
        case "<"  => c < l
        case "<=" => c <= l
        case o    => throw ParseException(s"unknown operator $o")
      }
    case Group("and", cs) => cs.map(compile(_, schema, fieldCol)).reduce(_ && _)
    case Group("or", cs)  => cs.map(compile(_, schema, fieldCol)).reduce(_ || _)
    case Group(o, _)      => throw ParseException(s"unknown combinator $o")
  }

  /** One-shot: parse + compile against a DataFrame schema. */
  def filterColumn(input: String, schema: StructType): Column =
    compile(parse(input), Some(schema))

  /** Compile for map-typed metadata: fields resolve as metadata['field']. */
  def metadataFilterColumn(input: String, metadataCol: Column): Column =
    compile(parse(input), None, f => metadataCol.getItem(f))

  /** Render the AST to an ANSI SQL predicate (used to cross-check with the oracle). */
  def toSql(node: Node, quoteField: String => String = identity): String = node match {
    case Cond(f, op, v) =>
      val sqlOp = if (op == "!=") "<>" else op
      s"${quoteField(f)} $sqlOp '${v.replace("'", "''")}'"
    case Group(op, cs) =>
      cs.map(c => s"(${toSql(c, quoteField)})").mkString(s" ${op.toUpperCase} ")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Query-language extensions over tokenized text: boolean queries
  * (AND/OR/NOT with parentheses), proximity (minimum token window holding
  * every term), and exact phrase match — the FTS5 `MATCH` features the
  * reference's conjunctive query prep never exposes
  * (`main/indexes/indexers/sqllite_indexer.py:145-150` quotes words and
  * joins with AND only; FTS5 itself understands phrases/NEAR/boolean).
  *
  * Two execution shapes, same semantics:
  *   - SCAN: one embarrassingly-parallel pass evaluating a per-row Column
  *     over the tokenized text — no shuffle until the top-k, whole-stage
  *     codegen throughout. The right plan for batch classification ("tag
  *     every matching document in the corpus").
  *   - POSTINGS: [[positionalPostings]] is the (term, docId, positions)
  *     table — the positional extension of the BM25 postings shape, written
  *     and compacted the same way — and [[phraseSearchPostings]] answers a
  *     phrase query from ≤ |phrase| narrow term-pruned reads instead of a
  *     corpus scan: the right plan for interactive search at 100 TB.
  *     Equality of the two paths is spec-pinned (QueryLangSpec).
  */
object QueryLang {

  // --------------------------------------------------------------- boolean

  /** Boolean query AST. */
  sealed trait Node
  final case class Term(word: String) extends Node
  /** Exact-phrase atom; with `lastPrefix` the LAST word is a prefix stem —
    * FTS5's phrase-prefix special case (`"vec sear"*`,
    * sqllite_indexer.py:106-114 is the engine it mirrors): the first n−1
    * tokens match exactly, the n-th matches any token starting with the stem.
    */
  final case class Phrase(words: Seq[String], lastPrefix: Boolean = false) extends Node
  /** One NEAR operand: a term (one word) or a quoted exact phrase, with
    * FTS5's phrase-prefix on the LAST word when `lastPrefix` (`vec*` or
    * `"hash jo"*` as an operand).
    */
  final case class NearOp(words: Seq[String], lastPrefix: Boolean = false)
  /** `NEAR(a "b c" d, n)` atom (FTS5's MATCH-embedded proximity): every
    * OPERAND — a term or a quoted exact phrase, exactly like FTS5's NEAR
    * over phrases — occurs fully inside some ≤`window`-token span. NOTE on
    * the window: this engine's NEAR convention everywhere is SPAN LENGTH
    * (first token of the earliest operand to last token of the latest,
    * inclusive), not FTS5's between-token gap count — `NEAR(a b, 3)` here
    * means a and b within a 3-token window. Default window 10, like FTS5.
    * A window that cannot hold even the LONGEST single operand is rejected
    * at parse (explicit and default windows alike — both paths of the
    * grammar see the same rule); a window that holds each operand but is too
    * small for all of them together simply matches nothing, on the scan and
    * the index path equally.
    */
  final case class Near(operands: Seq[NearOp], window: Int = 10) extends Node
  /** `tok*` prefix atom (FTS5 prefix queries): matches any token starting
    * with `stem`. A trailing `*` on the LAST word of a quoted phrase or of a
    * NEAR operand is the phrase-prefix form ([[Phrase]]/[[NearOp]]
    * `lastPrefix`); a `*` anywhere ELSE inside a phrase or operand stays
    * literal text (and dies at tokenization), like FTS5 outside its
    * phrase-prefix special case.
    */
  final case class Prefix(stem: String) extends Node
  /** `^atom` initial-token anchor (FTS5: "if a phrase begins with ^ it
    * matches only when its first token is the first token in the column"):
    * the wrapped atom — a term, quoted phrase, or prefix (`^key`,
    * `^"the fast"`, `^ta*`) — must OCCUR AT POSITION 1. Standalone atoms
    * only; `^` inside NEAR operands is rejected at parse.
    */
  final case class First(atom: Node) extends Node
  final case class And(l: Node, r: Node) extends Node
  final case class Or(l: Node, r: Node) extends Node
  final case class Not(child: Node) extends Node

  /** The (words, lastPrefix) occurrence pattern of an anchorable atom — the
    * shared decoding [[matchColumn]] and the index path use for [[First]].
    */
  private[operators] def firstWords(atom: Node): (Seq[String], Boolean) = atom match {
    case Term(w)        => (Seq(w), false)
    case Prefix(s)      => (Seq(s), true)
    case Phrase(ws, lp) => (ws, lp)
    case other => throw new IllegalArgumentException(
      s"^ anchors a term, phrase, or prefix atom — not $other")
  }

  /** Parse `spark AND (shuffle OR "hash join") AND NOT python`. Keywords are
    * case-insensitive; adjacency without a keyword is an implicit AND
    * (`spark shuffle` ≡ `spark AND shuffle`), matching common search-box
    * conventions; a double-quoted segment is an exact-phrase atom, and
    * `NEAR(a b c, n)` (window optional, default 10) is a proximity atom —
    * both compose with the boolean algebra like any term.
    * Precedence: NOT > AND > OR; parentheses group.
    */
  def parse(query: String): Node = {
    // lex: quoted segments become single phrase tokens (marked with a NUL
    // prefix no user token can carry), everything else splits on whitespace
    val lexed = {
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var i = 0
      while (i < query.length) {
        query.charAt(i) match {
          case '"' =>
            val end = query.indexOf('"', i + 1)
            require(end > i, s"unclosed quote in: $query")
            // `"..."*` (star immediately after the closing quote) is FTS5's
            // phrase-prefix special case — marked \u0001 vs plain-phrase \u0000
            if (end + 1 < query.length && query.charAt(end + 1) == '*') {
              out += "\u0001" + query.substring(i + 1, end)
              i = end + 2
            } else {
              out += "\u0000" + query.substring(i + 1, end)
              i = end + 1
            }
            // FTS5 raises on text abutting the closing quote (`"a b"x`,
            // `"a b"*x`); lexing it as an implicit AND would give a likely
            // typo silently different semantics — require a delimiter here
            require(i >= query.length || {
              val c = query.charAt(i)
              c.isWhitespace || c == '(' || c == ')' || c == ',' || c == '"'
            }, s"text abutting a quoted phrase at offset $i in: $query " +
               "(whitespace or a delimiter must follow the closing quote)")
          case '(' => out += "("; i += 1
          case ')' => out += ")"; i += 1
          case ',' => out += ","; i += 1
          case c if c.isWhitespace => i += 1
          case _ =>
            val end = query.indexWhere(
              c => c.isWhitespace || c == '(' || c == ')' || c == '"' || c == ',', i)
            val stop = if (end < 0) query.length else end
            out += query.substring(i, stop)
            i = stop
        }
      }
      out.toList
    }
    val toks = lexed
    def isKw(t: String, kw: String) = t.equalsIgnoreCase(kw)
    // recursive descent; each level returns (node, rest)
    def pOr(ts: List[String]): (Node, List[String]) = {
      var (n, rest) = pAnd(ts)
      while (rest.headOption.exists(isKw(_, "OR"))) {
        val (r, rr) = pAnd(rest.tail); n = Or(n, r); rest = rr
      }
      (n, rest)
    }
    def pAnd(ts: List[String]): (Node, List[String]) = {
      var (n, rest) = pNot(ts)
      var continue = true
      while (continue) rest.headOption match {
        case Some(t) if isKw(t, "AND") =>
          val (r, rr) = pNot(rest.tail); n = And(n, r); rest = rr
        case Some(t) if !isKw(t, "OR") && t != ")" => // implicit AND
          val (r, rr) = pNot(rest); n = And(n, r); rest = rr
        case _ => continue = false
      }
      (n, rest)
    }
    def pNot(ts: List[String]): (Node, List[String]) = ts match {
      case t :: tail if isKw(t, "NOT") =>
        val (c, rest) = pNot(tail); (Not(c), rest)
      case _ => pAtom(ts)
    }
    def pAtom(ts: List[String]): (Node, List[String]) = ts match {
      case t :: "(" :: tail if isKw(t, "NEAR") =>
        // NEAR(a "b c" d[, n]) — operands (terms or quoted phrases, like
        // FTS5's NEAR over phrases) until ',' or ')'; window literal optional
        val (words, afterWords) = tail.span(w => w != "," && w != ")")
        require(words.nonEmpty && words.forall(_ != "("),
          s"NEAR needs term/phrase operands (no nesting) in: $query")
        val operands = words.map { w =>
          val starred = w.startsWith("\u0001") // "..."* phrase-prefix operand
          if (w.startsWith("\u0000") || starred)
            NearOp(w.drop(1).toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq,
              lastPrefix = starred)
          else {
            // bare-word operand: boolean keywords are a syntax error (FTS5
            // raises on NEAR(a AND b, 5) — accepting them would silently
            // match the common corpus tokens 'and'/'or'/'not'); a trailing
            // `*` is the prefix form, like a standalone atom
            require(!Seq("and", "or", "not").contains(w.toLowerCase),
              s"boolean keyword '$w' inside NEAR operands in: $query (FTS5 rejects this)")
            require(!w.startsWith("^"),
              s"'^' anchor inside NEAR operands in: $query (anchors are standalone atoms)")
            if (w.length > 1 && w.endsWith("*") && !w.init.contains("*"))
              NearOp(Seq(w.init.toLowerCase), lastPrefix = true)
            else NearOp(Seq(w.toLowerCase))
          }
        }
        require(operands.forall(_.words.nonEmpty), s"empty NEAR operand in: $query")
        // One window rule for EXPLICIT and DEFAULT windows alike (the index
        // path applies the same rule after its own re-tokenization): reject a
        // window that cannot hold even the LONGEST single operand — a user
        // error on any corpus — but let windows too small for all operands
        // TOGETHER simply match nothing (scan and index agree on empty;
        // overlapping operands can legitimately satisfy sub-sum windows).
        def mkNear(w: Int): Near = {
          val longest = operands.map(_.words.size).max
          require(w >= longest,
            s"NEAR window $w cannot hold the ${longest}-token operand in: $query")
          Near(operands, w)
        }
        afterWords match {
          case "," :: n :: ")" :: rr =>
            val w = try n.toInt catch { case _: NumberFormatException =>
              throw new IllegalArgumentException(s"NEAR window must be an integer in: $query") }
            (mkNear(w), rr)
          case ")" :: rr => (mkNear(10), rr)
          case _ => throw new IllegalArgumentException(s"malformed NEAR(...) in: $query")
        }
      case "(" :: tail =>
        val (n, rest) = pOr(tail)
        rest match {
          case ")" :: rr => (n, rr)
          case _ => throw new IllegalArgumentException(s"unclosed '(' in: $query")
        }
      case "^" :: tail =>
        // A standalone '^' token anchors the NEXT atom: adjacent `^"a b"[*]`
        // lexes this way (the quote is a delimiter), and the
        // whitespace-separated `^ term` form is accepted for the same
        // consistency. Anything NOT anchorable — a group, NEAR(...), a
        // boolean keyword, another '^', end of input — is a clear syntax
        // error instead of silently parsing as the term "^".
        tail match {
          case w :: _ if w.startsWith("\u0000") || w.startsWith("\u0001") =>
            // ^"a b"[*] — anchored quoted phrase (the recursive pAtom call
            // returns a Term/Phrase/Prefix, all anchorable)
            val (atom, rest) = pAtom(tail)
            (First(atom), rest)
          case w :: rest
              if w != "(" && w != ")" && w != "," && w != "^" &&
                !w.startsWith("^") &&
                !isKw(w, "AND") && !isKw(w, "OR") && !isKw(w, "NOT") &&
                !(isKw(w, "NEAR") && rest.headOption.contains("(")) =>
            val atom: Node =
              if (w.length > 1 && w.endsWith("*") && !w.init.contains("*"))
                Prefix(w.init.toLowerCase)
              else Term(w.toLowerCase)
            (First(atom), rest)
          case _ =>
            throw new IllegalArgumentException(
              s"'^' must anchor a term, prefix, or quoted phrase in: $query")
        }
      case w :: tail if w.startsWith("\u0000") || w.startsWith("\u0001") =>
        // quoted phrase atom (lexer marks: \u0001 = trailing-star phrase-prefix)
        val lp = w.startsWith("\u0001")
        val words = w.drop(1).toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
        require(words.nonEmpty, s"empty phrase in: $query")
        if (words.size == 1) ((if (lp) Prefix(words.head) else Term(words.head)), tail)
        else (Phrase(words, lp), tail)
      case w :: tail if w.length > 1 && w.startsWith("^") =>
        // ^tok / ^tok* — anchored bare atom (FTS5 initial-token match).
        // ^NEAR(...) would silently parse as the anchored TERM 'near'
        // followed by a parenthesized group — reject it instead.
        require(!(w.drop(1).equalsIgnoreCase("NEAR") && tail.headOption.contains("(")),
          s"'^' cannot anchor NEAR(...) in: $query (anchors wrap terms, phrases, prefixes)")
        val body = w.drop(1)
        val atom: Node =
          if (body.length > 1 && body.endsWith("*") && !body.init.contains("*"))
            Prefix(body.init.toLowerCase)
          else Term(body.toLowerCase)
        (First(atom), tail)
      case w :: tail if w != ")" && w != "," && !isKw(w, "AND") && !isKw(w, "OR") =>
        if (w.length > 1 && w.endsWith("*") && !w.init.contains("*"))
          (Prefix(w.init.toLowerCase), tail)
        else (Term(w.toLowerCase), tail)
      case other =>
        throw new IllegalArgumentException(s"expected a term at: $other in: $query")
    }
    val (node, rest) = pOr(toks)
    require(rest.isEmpty, s"trailing tokens $rest in: $query")
    node
  }

  /** Tokens of `textCol` under the ENGINE tokenizer ([[Search.tokensCol]]:
    * lowercase, split on `[^a-z0-9]+` runs) — the scan path's DEFAULT, so
    * the same MATCH grammar returns the same matches on the scan and the
    * index paths ("hash-join" matches `hash` on BOTH). The reference has
    * exactly ONE tokenizer for its whole engine (FTS5 unicode61,
    * `main/indexes/indexers/sqllite_indexer.py:106-114`); this mirrors that
    * single-tokenizer contract. Corpora that are pre-tokenized on single
    * spaces and want hyphenated/punctuated words kept whole opt in to
    * [[spaceTokensOf]] via the scan functions' `tokenizer` parameter.
    */
  def tokens(textCol: String): Column =
    tokensOf(col(textCol))

  /** Column-typed form of [[tokens]] — the default `tokenizer` of the scan
    * functions below; identical to the index family's tokenizer.
    */
  def tokensOf(text: Column): Column =
    Search.tokensCol(text)

  /** Single-space tokens, lowercased — the explicit-opt-in PARITY tokenizer
    * (the pre-unification scan default). Use for corpora already joined on
    * single spaces where punctuation is payload, not separator; everything
    * built through an index ignores this and uses [[Search.tokensCol]].
    */
  def spaceTokensOf(text: Column): Column =
    filter(split(lower(text), " "), x => x =!= "")

  /** String-level twin of [[spaceTokensOf]] — pass as `atomTokenizer` when
    * the corpus side opts into the space tokenizer, so QUERY atoms normalize
    * under the same rules as the text they must match.
    */
  def spaceTokenize(s: String): Seq[String] =
    if (s == null) Nil else s.toLowerCase.split(" ").filter(_.nonEmpty).toSeq

  /** Occurrence START positions (1-based) of a word sequence in `toksCol`;
    * with `lastPrefix` the last word matches by `startsWith` (FTS5
    * phrase-prefix) — the shared core of the scan path's phrase and NEAR
    * evaluation. Pure array expressions, codegen-friendly.
    */
  private def occurrenceStarts(toksCol: Column, words: Seq[String],
                               lastPrefix: Boolean): Column =
    // one codegen'd kernel pass ([[graft.plans.OccurrenceStarts]]) — the
    // declarative `filter(sequence(1, n-l+1), p -> slice(toks,p,l) = arr)`
    // form ran its lambda interpreted and allocated a slice per position
    // (QueryLangPropertySpec pins the kernel against the independent
    // reference evaluator over thousands of generated ASTs)
    graft.plans.TokenizeFunctions.occurrenceStarts(toksCol, words, lastPrefix)

  /** The AST as ONE codegen'd predicate over a token-array column. */
  def matchColumn(node: Node, toksCol: Column): Column = node match {
    case Term(w)   => array_contains(toksCol, w)
    case Phrase(ws, lp) =>
      size(occurrenceStarts(toksCol, ws, lp)) > 0
    case Near(ops, w) =>
      // per-operand occurrence START positions (a single term is a length-1
      // phrase); then: exists a start s — necessarily an operand occurrence
      // start — where every operand occurs FULLY inside [s, s+w-1]
      val opsD = ops.distinct
      val starts = opsD.map(op => occurrenceStarts(toksCol, op.words, op.lastPrefix))
      exists(array_sort(flatten(array(starts: _*))),
        s => opsD.zip(starts).map { case (op, st) =>
          exists(st, p => p >= s && p + lit(op.words.size - 1) <= s + lit(w - 1))
        }.reduce(_ && _))
    case Prefix(s) => exists(toksCol, x => x.startsWith(s))
    case First(atom) => // initial-token anchor: the atom occurs AT position 1
      val (ws, lp) = firstWords(atom)
      array_contains(occurrenceStarts(toksCol, ws, lp), 1)
    case And(l, r) => matchColumn(l, toksCol) && matchColumn(r, toksCol)
    case Or(l, r)  => matchColumn(l, toksCol) || matchColumn(r, toksCol)
    case Not(c)    => !matchColumn(c, toksCol)
  }

  /** The positive atoms of the AST: (exact terms, prefix stems). Negated
    * atoms contribute nothing — they don't score.
    */
  /** Negation normal form: double negations eliminated, NOT pushed through
    * AND/OR by De Morgan until it wraps atoms only. Semantically the
    * identity ([[matchColumn]] and the candidate algebra agree on it by
    * construction), but it makes "positive" well-defined: an atom is
    * positive iff it sits under NO Not in the NNF. Without it,
    * `NOT NOT b*` had zero positive atoms and the index path returned an
    * empty frame while its candidate set was non-empty (caught by the r15
    * lifecycle property, seed 37).
    */
  private[operators] def nnf(n: Node, neg: Boolean = false): Node = n match {
    case Not(c)    => nnf(c, !neg)
    case And(l, r) =>
      if (neg) Or(nnf(l, neg = true), nnf(r, neg = true))
      else And(nnf(l), nnf(r))
    case Or(l, r)  =>
      if (neg) And(nnf(l, neg = true), nnf(r, neg = true))
      else Or(nnf(l), nnf(r))
    case atom      => if (neg) Not(atom) else atom
  }

  /** Normalize every atom's WORDS through the string tokenizer `tok` — the
    * single-tokenizer contract applied to the QUERY side: `parse` only
    * lowercases, so with the engine tokenizer (`[^a-z0-9]+` split) the atom
    * `hash-join` must become `hash AND join` before it can match the token
    * stream at all. Rules (FTS5's, mirrored by the index path which
    * delegates here):
    *   - a [[Term]] whose word splits becomes an AND of its tokens; one with
    *     NO indexable tokens raises (matching the index path's error — the
    *     two paths must agree on errors too);
    *   - [[Phrase]]/[[Near]] operand words flatMap (a splitting word widens
    *     its phrase in place — FTS5 treats the consecutive tokens of one
    *     string as a phrase); an operand left empty raises;
    *   - a [[Prefix]] stem must survive as ONE token;
    *   - an anchored ([[First]]) bare word that splits anchors as a PHRASE
    *     of its tokens (an AND of two both-anchored terms could never match).
    */
  private[operators] def normalize(n: Node, tok: String => Seq[String],
                                   query: String): Node = {
    def normWords(ws: Seq[String], lastPrefix: Boolean, what: String): Seq[String] = {
      val ts =
        if (!lastPrefix) ws.flatMap(tok)
        else {
          val lastTs = tok(ws.last)
          require(lastTs.nonEmpty,
            s"prefix stem '${ws.last}*' has no indexable tokens in: $query")
          ws.init.flatMap(tok) ++ lastTs
        }
      if (ts.isEmpty) throw new IllegalArgumentException(
        s"$what '${ws.mkString(" ")}' has no indexable tokens in: $query")
      ts
    }
    def norm(n: Node): Node = n match {
      case Term(w) => tok(w) match {
        case Seq(t)             => Term(t)
        case ts if ts.nonEmpty  => ts.map(Term(_): Node).reduceLeft(And(_, _))
        case _ => throw new IllegalArgumentException(
          s"term '$w' has no indexable tokens in: $query")
      }
      case Phrase(ws, lp) => normWords(ws, lp, "phrase") match {
        case Seq(t) => if (lp) Prefix(t) else Term(t)
        case ts     => Phrase(ts, lp)
      }
      case Near(ops, w) =>
        Near(ops.map(o =>
          NearOp(normWords(o.words, o.lastPrefix, "NEAR operand"), o.lastPrefix)), w)
      case Prefix(s0) => tok(s0) match {
        case Seq(t) => Prefix(t)
        case _ => throw new IllegalArgumentException(
          s"prefix '$s0*' must be a single indexable token in: $query")
      }
      case First(atom) =>
        val inner = atom match {
          case Term(w) => tok(w) match {
            case Seq(t) => Term(t)
            case ts if ts.nonEmpty => Phrase(ts)
            case _ => throw new IllegalArgumentException(
              s"anchored term '$w' has no indexable tokens in: $query")
          }
          case other => norm(other) match {
            case nn @ (_: Term | _: Phrase | _: Prefix) => nn
            case nn => throw new IllegalArgumentException(
              s"^ anchors a term, phrase, or prefix atom — not $nn")
          }
        }
        First(inner)
      case And(l, r) => And(norm(l), norm(r))
      case Or(l, r)  => Or(norm(l), norm(r))
      case Not(c)    => Not(norm(c))
    }
    norm(n)
  }

  private[operators] def positiveAtoms(node: Node): (Seq[String], Seq[String]) =
    positiveAtomsNnf(nnf(node))

  private def positiveAtomsNnf(node: Node): (Seq[String], Seq[String]) = node match {
    case Term(w)    => (Seq(w), Nil)
    case Prefix(s)  => (Nil, Seq(s))
    // phrase members score as terms; a prefix-marked last word scores as a
    // prefix stem (the vocabulary expansion it matches)
    case Phrase(ws, lp) => if (lp) (ws.init, Seq(ws.last)) else (ws, Nil)
    case Near(ops, _) => // NEAR operand words score as terms / prefix stems
      (ops.flatMap(o => if (o.lastPrefix) o.words.init else o.words),
        ops.collect { case o if o.lastPrefix => o.words.last })
    case First(atom) => positiveAtomsNnf(atom) // the anchor doesn't change scoring
    case And(l, r)  =>
      val (a, b) = positiveAtomsNnf(l); val (c, d) = positiveAtomsNnf(r); (a ++ c, b ++ d)
    case Or(l, r)   =>
      val (a, b) = positiveAtomsNnf(l); val (c, d) = positiveAtomsNnf(r); (a ++ c, b ++ d)
    case Not(_)     => (Nil, Nil) // NNF input: Not wraps atoms only
  }

  /** Public view of [[positiveAtoms]] over a raw query string:
    * (exact terms, prefix stems) that SCORE — what a highlighter should
    * mark in result text.
    */
  def positiveAtomsOf(query: String): (Seq[String], Seq[String]) = {
    val (t, p) = positiveAtoms(parse(query))
    (t.distinct, p.distinct)
  }

  private[operators] def positiveTerms(node: Node): Seq[String] = positiveAtoms(node)._1

  /** Boolean search over the corpus: docs satisfying `query`, ranked by
    * (matched positive terms desc, their total tf desc, id asc), top `k`.
    */
  def booleanSearch(docs: DataFrame, idCol: String, textCol: String,
                    query: String, k: Int,
                    tokenizer: Column => Column = tokensOf,
                    atomTokenizer: String => Seq[String] = Search.tokenize): DataFrame = {
    require(k >= 1, "k must be >= 1")
    // normalize QUERY atoms through the string twin of `tokenizer` (the
    // scan==index contract's query side: `hash-join` must compile to
    // `hash AND join`, not to array_contains(_t, "hash-join") which the
    // engine tokenizer can never emit); callers overriding `tokenizer` pass
    // its matching `atomTokenizer` (e.g. [[spaceTokensOf]]/[[spaceTokenize]])
    val node = nnf(normalize(parse(query), atomTokenizer, query))
    val (posT, posP) = positiveAtoms(node)
    val pos = posT.distinct.sorted
    val stems = posP.distinct.sorted
    // a token "counts" when it equals a positive term or carries a positive
    // prefix; each prefix atom counts at most once toward n_matched (like a
    // term), while tf_total counts every matching token occurrence
    def tokMatches(x: Column): Column =
      stems.foldLeft(array_contains(col("_q"), x))((acc, s) => acc || x.startsWith(s))
    docs
      // an empty literal array is NullType-element — cast so a pure-prefix
      // query's _q still types as array<string>
      .withColumn("_q", array(pos.map(lit): _*).cast("array<string>"))
      .withColumn("_t", tokenizer(col(textCol)))
      .where(matchColumn(node, col("_t")))
      .withColumn("n_matched",
        (expr("size(filter(_q, t -> array_contains(_t, t)))") +
          stems.map(s => when(exists(col("_t"), x => x.startsWith(s)), 1).otherwise(0))
            .foldLeft(lit(0): Column)(_ + _)).cast("long"))
      .withColumn("tf_total",
        size(filter(col("_t"), x => tokMatches(x))).cast("long"))
      .select(col(idCol), col("n_matched"), col("tf_total"))
      .orderBy(col("n_matched").desc, col("tf_total").desc, col(idCol))
      .limit(k)
  }

  // ------------------------------------------------------------- proximity

  /** Minimum-span proximity search: among docs containing EVERY term, the
    * smallest token window covering all of them (1-based start), ranked
    * (span asc, id asc), top `k`. One codegen'd two-pointer pass per row
    * ([[graft.plans.MinCoverSpan]]): O(tokens) regardless of term frequency
    * or row length — embarrassingly parallel, no shuffle before the top-k,
    * safe on unchunked book-length rows. [[nearSearchPostings]] over the
    * positional artifact remains the interactive-latency path (≤ |terms|
    * term-pruned narrow reads instead of a corpus scan), not a
    * per-row-complexity escape hatch.
    */
  def minSpanSearch(docs: DataFrame, idCol: String, textCol: String,
                    terms: Seq[String], k: Int,
                    tokenizer: Column => Column = tokensOf,
                    atomTokenizer: String => Seq[String] = Search.tokenize): DataFrame = {
    require(terms.nonEmpty, "need at least one term")
    require(k >= 1, "k must be >= 1")
    // ONE codegen'd two-pointer pass per row ([[graft.plans.MinCoverSpan]]):
    // O(tokens), null when some term is absent; same minimum and the same
    // earliest-start tie-break as the retired declarative formulation
    // (spec-pinned). Raw terms normalize through the atom tokenizer first —
    // a punctuated term like "hash-join" contributes BOTH its tokens to the
    // cover set (the scan==index contract's query side).
    val q = terms.flatMap(atomTokenizer).distinct.sorted
    require(q.nonEmpty, s"terms ${terms.mkString(", ")} have no indexable tokens")
    docs
      .withColumn("_s", graft.plans.TokenizeFunctions.minCoverSpan(
        tokenizer(col(textCol)), q))
      .where(col("_s").isNotNull)
      .select(col(idCol), col("_s.span_len").as("span_len"),
        col("_s.span_start").as("span_start"))
      .orderBy(col("span_len"), col(idCol))
      .limit(k)
  }

  // ---------------------------------------------------------------- phrase

  /** Exact phrase occurrences by direct scan: docs where the token sequence
    * `phrase` occurs verbatim, with occurrence count and first position
    * (1-based), ranked (tf desc, id asc), top `k`.
    */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
                   phrase: Seq[String], k: Int,
                   tokenizer: Column => Column = tokensOf,
                   atomTokenizer: String => Seq[String] = Search.tokenize): DataFrame = {
    require(phrase.nonEmpty, "need a non-empty phrase")
    require(k >= 1, "k must be >= 1")
    // phrase words flatMap through the atom tokenizer (a word that splits
    // widens the phrase in place, FTS5-style) — same rule as the postings
    // path's phraseView, so scan == index on punctuated queries too
    val toks = phrase.flatMap(atomTokenizer)
    require(toks.nonEmpty, s"phrase '${phrase.mkString(" ")}' has no indexable tokens")
    docs
      .withColumn("_t", tokenizer(col(textCol)))
      // starts from the same kernel the whole scan MATCH family uses
      .withColumn("_pos", graft.plans.TokenizeFunctions.occurrenceStarts(
        col("_t"), toks, lastPrefix = false))
      .where(size(col("_pos")) > 0)
      .select(col(idCol),
        size(col("_pos")).cast("long").as("phrase_tf"),
        element_at(col("_pos"), 1).cast("long").as("first_pos"))
      .orderBy(col("phrase_tf").desc, col(idCol))
      .limit(k)
  }

  /** NEAR from positional postings: docs where SOME token window of at most
    * `window` tokens holds every term, with that minimal span. Same
    * candidate rule as [[minSpanSearch]] — a minimal covering window starts
    * at a term occurrence — but evaluated over the terms' POSITION ARRAYS
    * (≤ |terms| term-pruned reads), never the token stream: per doc the
    * cost is occurrences² × terms, independent of document length.
    * Returns (docId, span_len, span_start) ranked (span asc, id asc).
    */
  def nearSearchPostings(postings: DataFrame, terms: Seq[String],
                         window: Int, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    nearHitsPostings(postings, terms, window)
      .orderBy(col("span_len"), col("docId"))
      .limit(k)
  }

  /** The UNRANKED NEAR hits (docId, span_len, span_start) — callers that
    * aggregate further (e.g. chunk → document roll-up) skip the top-k sort.
    */
  def nearHitsPostings(postings: DataFrame, terms: Seq[String],
                       window: Int): DataFrame = {
    require(terms.nonEmpty, "need at least one term")
    // window rule matches the parser's: any window that holds one term
    // (length 1) is VALID; one too small for all the distinct terms together
    // just matches nothing (the span filter returns empty) — same semantics
    // as the scan path.
    require(window >= 1, "window must be >= 1")
    val ts = terms.map(_.toLowerCase).distinct
    nearHitsOperands(ts.map(t =>
      (postings.where(col("term") === t)
        .select(col("docId"), col("positions").as("starts")), 1)), window)
  }

  /** NEAR over OPERANDS — each a (docId, starts) frame of occurrence start
    * positions plus the operand's token length (1 for a term, |phrase| for a
    * phrase operand from [[phraseStartsPostings]]) — generalizing
    * [[nearHitsPostings]] to FTS5's NEAR-over-phrases: the minimal window
    * must hold every operand FULLY, so each operand's window end is its
    * first-start-at-or-after-s plus (length − 1). Candidate starts are
    * operand occurrence starts, capped at the least last start so the
    * first-at-or-after lookups stay non-null (greatest() ignores nulls —
    * the cap is what makes it safe).
    */
  def nearHitsOperands(frames: Seq[(DataFrame, Int)], window: Int): DataFrame = {
    require(frames.nonEmpty, "need at least one operand")
    require(window >= 1, "window must be >= 1")
    val named = frames.zipWithIndex.map { case ((df, len), j) =>
      (df.select(col("docId"), col("starts").as(s"_p$j")), len, j)
    }
    val joined = named.map(_._1).reduceLeft(_.join(_, Seq("docId")))
    val arrs = named.map { case (_, len, j) => (s"_p$j", len) }
    // least()/greatest() require >1 argument — a single-operand NEAR (one
    // term, or duplicates collapsing under distinct) uses the lone
    // expression directly (found by the grammar property harness)
    def fold(fn: String, exprs: Seq[String]): String =
      if (exprs.size == 1) exprs.head else s"$fn(${exprs.mkString(", ")})"
    val sMax = fold("least", arrs.map { case (a, _) => s"array_max($a)" })
    val endAt = (s: String) => fold("greatest", arrs.map { case (a, len) =>
      s"array_min(filter($a, q -> q >= $s)) + ${len - 1}" })
    joined
      .withColumn("_cand", expr(
        s"""transform(filter(array_sort(flatten(array(${arrs.map(_._1).mkString(", ")}))),
           |                 s -> s <= $sMax),
           |  s -> named_struct('e', ${endAt("s")}, 'st', s))""".stripMargin))
      .where(size(col("_cand")) > 0)
      .withColumn("span_len",
        expr("array_min(transform(_cand, c -> c.e - c.st + 1))").cast("long"))
      .where(col("span_len") <= window)
      .withColumn("span_start",
        expr("array_min(transform(filter(_cand, c -> c.e - c.st + 1 = span_len), c -> c.st))")
          .cast("long"))
      .select(col("docId"), col("span_len"), col("span_start"))
  }

  /** The (term, docId, positions) positional postings table — one tokenize +
    * posexplode + groupBy, range-partitioned by term like the BM25 base
    * segment so term lookups prune by row-group stats. The LSM treatment
    * (delta segments, tombstones, folds) applies unchanged: positions are
    * per-(term, doc) facts exactly like tf.
    */
  def positionalPostings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("docId"), posexplode(tokens(textCol)).as(Seq("p", "term")))
      .groupBy("term", "docId")
      .agg(sort_array(collect_list(col("p") + 1)).as("positions"))

  /** Phrase search answered from [[positionalPostings]]: read ≤ |phrase|
    * term slices, shift each term's positions back by its offset in the
    * phrase, and intersect — surviving positions are exactly the phrase's
    * start positions. Joins key on docId after per-term filters; the first
    * (ideally rarest) term's list anchors. Results equal [[phraseSearch]]
    * bit-for-bit (spec-pinned).
    */
  def phraseSearchPostings(postings: DataFrame, phrase: Seq[String], k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    phraseHitsPostings(postings, phrase)
      .orderBy(col("phrase_tf").desc, col("docId"))
      .limit(k)
  }

  /** The UNRANKED phrase hits (docId, phrase_tf, first_pos) — callers that
    * aggregate further (e.g. chunk → document roll-up) skip the top-k sort.
    * `lastPrefix` = FTS5's phrase-prefix: the LAST slot's positions come from
    * a `startsWith` (range-predicate) term read instead of an equality.
    */
  def phraseHitsPostings(postings: DataFrame, phrase: Seq[String],
                         lastPrefix: Boolean = false): DataFrame =
    phraseStartsPostings(postings, phrase, lastPrefix)
      .select(col("docId"),
        size(col("starts")).cast("long").as("phrase_tf"),
        element_at(col("starts"), 1).cast("long").as("first_pos"))

  /** The phrase's occurrence START positions per doc (docId, starts sorted
    * ascending, non-empty) — the shared core of [[phraseHitsPostings]] and
    * the phrase OPERANDS of NEAR ([[nearHitsOperands]]). With `lastPrefix`
    * the last slot matches any vocabulary term starting with the stem: its
    * read is a range predicate on the term-sorted postings (the same
    * row-group-pruning class as the equality reads), and the matching terms'
    * per-doc position arrays merge before the shift-intersect — positions of
    * DIFFERENT terms are disjoint, so the merge is a plain concatenation.
    */
  def phraseStartsPostings(postings: DataFrame, phrase: Seq[String],
                           lastPrefix: Boolean = false): DataFrame = {
    require(phrase.nonEmpty, "need a non-empty phrase")
    val terms = phrase.map(_.toLowerCase)
    // one shifted frame per phrase SLOT (a repeated word contributes every
    // offset it occupies), then an inner-join chain on docId
    val shifted = terms.zipWithIndex.map { case (t, j) =>
      if (lastPrefix && j == terms.size - 1)
        postings.where(col("term").startsWith(t))
          .select(col("docId"),
            expr(s"transform(positions, p -> p - $j)").as(s"_s$j"))
          .groupBy("docId")
          .agg(flatten(collect_list(col(s"_s$j"))).as(s"_s$j"))
      else
        postings.where(col("term") === t)
          .select(col("docId"),
            expr(s"transform(positions, p -> p - $j)").as(s"_s$j"))
    }
    val joined = shifted.reduceLeft { (a, b) => a.join(b, Seq("docId")) }
    val inter = (1 until terms.size).foldLeft(col("_s0")) { (acc, j) =>
      array_intersect(acc, col(s"_s$j"))
    }
    joined
      .withColumn("starts", sort_array(inter))
      .where(size(col("starts")) > 0)
      .select(col("docId"), col("starts"))
  }
}

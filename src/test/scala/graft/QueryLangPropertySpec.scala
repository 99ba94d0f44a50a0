package graft

import graft.operators.QueryLang
import graft.operators.QueryLang._
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}
import org.scalatest.funsuite.AnyFunSuite

/** Property harness for the MATCH grammar: random ASTs render to query
  * strings, round-trip through the parser, and evaluate over random token
  * documents IDENTICALLY on two independent implementations — the Catalyst
  * `matchColumn` expression tree and a plain-Scala reference evaluator
  * written directly from the documented semantics. Curated cases pin the
  * scan≡index equivalence (QueryLangSpec); this spec pins parser+scan
  * against an executable spec across thousands of generated shapes.
  */
class QueryLangPropertySpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  // ------------------------------------------------------- reference model

  /** Occurrence START positions (1-based) of a word pattern — the documented
    * semantics of [[QueryLang.occurrenceStarts]], re-derived independently.
    */
  private def startsOf(toks: Seq[String], ws: Seq[String], lp: Boolean): Seq[Int] = {
    val l = ws.size
    (1 to toks.size - l + 1).filter { p =>
      val win = toks.slice(p - 1, p - 1 + l)
      if (!lp) win == ws
      else win.init == ws.init && win.last.startsWith(ws.last)
    }
  }

  private def evalRef(n: Node, toks: Seq[String]): Boolean = n match {
    case Term(w)        => toks.contains(w)
    case Prefix(s)      => toks.exists(_.startsWith(s))
    case Phrase(ws, lp) => startsOf(toks, ws, lp).nonEmpty
    case First(atom)    => atom match {
      case Term(w)        => startsOf(toks, Seq(w), lp = false).contains(1)
      case Prefix(st)     => startsOf(toks, Seq(st), lp = true).contains(1)
      case Phrase(ws, lp) => startsOf(toks, ws, lp).contains(1)
      case other          => fail(s"unanchorable atom $other")
    }
    case Near(ops, w)   =>
      val opsD = ops.distinct
      val perOp = opsD.map(o => (o, startsOf(toks, o.words, o.lastPrefix)))
      val cands = perOp.flatMap(_._2).sorted
      cands.exists(s => perOp.forall { case (o, st) =>
        st.exists(p => p >= s && p + o.words.size - 1 <= s + w - 1)
      })
    case And(l, r) => evalRef(l, toks) && evalRef(r, toks)
    case Or(l, r)  => evalRef(l, toks) || evalRef(r, toks)
    case Not(c)    => !evalRef(c, toks)
  }

  // ---------------------------------------------------------- AST renderer

  /** Render an AST back to query syntax; parse(render(n)) must equal n for
    * every generated shape (the generator avoids forms the parser
    * normalizes away, e.g. 1-word phrases).
    */
  private def render(n: Node): String = n match {
    case Term(w)    => w
    case Prefix(s)  => s + "*"
    case Phrase(ws, lp) => "\"" + ws.mkString(" ") + "\"" + (if (lp) "*" else "")
    case First(atom) => "^" + render(atom)
    case Near(ops, w) =>
      val rendered = ops.map { o =>
        if (o.words.size == 1 && !o.lastPrefix) o.words.head
        else if (o.words.size == 1) o.words.head + "*"
        else "\"" + o.words.mkString(" ") + "\"" + (if (o.lastPrefix) "*" else "")
      }
      s"NEAR(${rendered.mkString(" ")}, $w)"
    case And(l, r) => s"(${render(l)} AND ${render(r)})"
    case Or(l, r)  => s"(${render(l)} OR ${render(r)})"
    case Not(c)    => s"NOT ${render(c)}"
  }

  /** Join tokens with randomly drawn punctuation/whitespace separators —
    * the ENGINE tokenizer ([^a-z0-9]+ split, the scan default since r15)
    * must recover exactly the token sequence, so every property below runs
    * on punctuated text, not just space-joined corpora (r14 VERDICT ask 1).
    */
  private def punctJoin(rnd: scala.util.Random, ts: Seq[String]): String = {
    val seps = Seq(" ", "-", ", ", ". ", "  ", "_", "; ", " / ")
    val body = ts match {
      case Nil => ""
      case head +: tail =>
        tail.foldLeft(new StringBuilder(head)) { (b, t) =>
          b.append(seps(rnd.nextInt(seps.size))).append(t)
        }.toString
    }
    (if (rnd.nextInt(4) == 0) "(" else "") + body +
      (if (rnd.nextInt(4) == 0) "." else "")
  }

  // ------------------------------------------------------------ generators

  // lowercase, keyword-free vocabulary; 'a' is a stem of several words so
  // prefix atoms hit something, 'zq' never occurs so misses are exercised
  private val vocab = Seq("ax", "ay", "bx", "by", "cx", "dx", "zq")
  private val genWord = Gen.oneOf(vocab)
  private val genStem = Gen.oneOf("a", "b", "c", "ax", "zq")

  private val genTerm: Gen[Node]   = genWord.map(Term(_))
  private val genPrefix: Gen[Node] = genStem.map(Prefix(_))
  private val genPhrase: Gen[Node] = for {
    n  <- Gen.choose(2, 3)
    ws <- Gen.listOfN(n, genWord)
    lp <- Gen.oneOf(true, false)
  } yield Phrase(ws, lp)
  private val genNearOp: Gen[NearOp] = Gen.frequency(
    3 -> genWord.map(w => NearOp(Seq(w))),
    1 -> genStem.map(s => NearOp(Seq(s), lastPrefix = true)),
    1 -> Gen.listOfN(2, genWord).map(ws => NearOp(ws)),
    1 -> Gen.listOfN(2, genWord).map(ws => NearOp(ws, lastPrefix = true)))
  private val genNear: Gen[Node] = for {
    k   <- Gen.choose(1, 3)
    ops <- Gen.listOfN(k, genNearOp)
    max = ops.map(_.words.size).max
    w   <- Gen.choose(max, max + 6)
  } yield Near(ops, w)
  private val genFirst: Gen[Node] = Gen.frequency(
    2 -> genTerm, 1 -> genPrefix, 1 -> genPhrase).map(a => First(a))

  private val genAtom: Gen[Node] = Gen.frequency(
    4 -> genTerm, 2 -> genPrefix, 2 -> genPhrase, 2 -> genNear, 1 -> genFirst)

  private def genNode(depth: Int): Gen[Node] =
    if (depth <= 0) genAtom
    else Gen.frequency(
      3 -> genAtom,
      2 -> (for { l <- genNode(depth - 1); r <- genNode(depth - 1) } yield And(l, r)),
      2 -> (for { l <- genNode(depth - 1); r <- genNode(depth - 1) } yield Or(l, r)),
      1 -> genNode(depth - 1).map(Not(_)))

  // ----------------------------------------------------------------- tests

  test("render → parse round-trips every generated AST") {
    val prop = Prop.forAll(genNode(3)) { node =>
      parse(render(node)) == node
    }
    val res = check(Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("matchColumn agrees with the reference evaluator on random ASTs × random docs") {
    // fixed doc corpus, many ASTs: all Column evaluations ride ONE job via
    // a multi-column select, so the property runs in seconds not minutes
    val rnd = new scala.util.Random(42)
    val docs = (1 to 80).map { i =>
      val n = rnd.nextInt(11)
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))))
    }
    val df = docs.map { case (id, ts) => (id, punctJoin(rnd, ts)) }
      .toDF("doc_id", "text")
      .withColumn("_t", QueryLang.tokens("text"))
    val nodes = Gen.listOfN(60, genNode(3)).pureApply(
      org.scalacheck.Gen.Parameters.default, org.scalacheck.rng.Seed(7L))
    val cols = nodes.zipWithIndex.map { case (n, i) =>
      QueryLang.matchColumn(n, col("_t")).as(s"m$i")
    }
    val rows = df.select(col("doc_id") +: cols: _*).collect()
      .map(r => r.getLong(0) -> r).toMap
    val byId = docs.toMap
    for ((node, i) <- nodes.zipWithIndex; (id, _) <- docs) {
      val got = rows(id).getBoolean(i + 1)
      val want = evalRef(node, byId(id))
      assert(got === want,
        s"query ${render(node)} on doc ${byId(id).mkString(" ")}: spark=$got ref=$want")
    }
  }

  test("index path agrees with the reference evaluator on random ASTs over one built index") {
    // one corpus, one index build (+ positional artifact), then a sample of
    // generated ASTs each answered by booleanSearch's candidate algebra —
    // the production path: normalizedAst + posting-set algebra + positional
    // reads. The corpus text is PUNCTUATED (punctJoin) and the vocabulary is
    // pure letters, so the engine tokenizer recovers exactly the generated
    // token sequence — the reference evaluator's token view IS the index's.
    val rnd = new scala.util.Random(11)
    val docs = (1 to 60).map { i =>
      val n = 1 + rnd.nextInt(10)
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))))
    }
    val df = docs.map { case (id, ts) => (id, punctJoin(rnd, ts)) }
      .toDF("chunkId", "indexedData")
    val dir = java.nio.file.Files.createTempDirectory("graft-qlprop").toString
    // chunks table with a metadata column, so the filter composition is
    // part of the property: even ids are lang=en
    df.withColumn("lang", when(col("chunkId") % 2 === 0, "en").otherwise("de"))
      .write.parquet(s"$dir/chunks")
    val idx = new graft.operators.Bm25Indexer(spark, dir, chunksPath = s"$dir/chunks")
    idx.index(df)
    idx.buildPhraseIndex(df)
    val nodes = Gen.listOfN(25, genNode(2)).pureApply(
      org.scalacheck.Gen.Parameters.default, org.scalacheck.rng.Seed(23L))
    val byId = docs.toMap
    var checked = 0
    nodes.foreach { node =>
      val q = render(node)
      val got =
        try Some(idx.booleanSearch(q, 1000).collect().map(_.getLong(0)).toSet)
        catch { case e: IllegalArgumentException
          if e.getMessage.contains("complement") => None } // pure-NOT: rejected by design
      got.foreach { ids =>
        val want = docs.collect { case (id, ts) if evalRef(node, ts) => id }.toSet
        assert(ids === want, s"query $q: index=$ids ref=$want")
        // the metadata gate composes as want ∩ filtered — the reference's
        // doc_id IN (...) shape, on every generated query
        val gated = idx.booleanSearch(q, 1000, Some(col("lang") === "en"))
          .collect().map(_.getLong(0)).toSet
        assert(gated === want.filter(_ % 2 == 0), s"filtered query $q")
        checked += 1
      }
    }
    assert(checked >= 15, s"too few non-complement samples ($checked) — regenerate")
  }

  test("LSM lifecycle property: build → update → pure-delete → compact keeps index == reference on generated MATCH queries") {
    // The static-index property above pins scan==index on a freshly built
    // index; THIS one pins the same agreement across the artifact's whole
    // LSM lifecycle — base build, a delete+append merge (delta segments +
    // tombstones now serve), a pure delete of DELTA-resident docs (tombstones
    // over deltas), and a compaction fold — for generated queries including
    // anchors and phrase-prefix atoms, whose positional segments the
    // lifecycle machinery manages (r14 VERDICT ask 3).
    val rnd = new scala.util.Random(31)
    def mkDocs(ids: Range): Seq[(Long, Seq[String])] = ids.map { i =>
      val n = 1 + rnd.nextInt(10)
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))))
    }
    val initial = mkDocs(1 to 50)
    val df0 = initial.map { case (id, ts) => (id, punctJoin(rnd, ts)) }
      .toDF("chunkId", "indexedData").persist()
    df0.count()
    val dir = java.nio.file.Files.createTempDirectory("graft-qlprop-lsm").toString
    val idx = new graft.operators.Bm25Indexer(spark, dir, chunksPath = s"$dir/unused")
    idx.index(df0)
    idx.buildPhraseIndex(df0)

    val nodes = Gen.listOfN(18, genNode(2)).pureApply(
      org.scalacheck.Gen.Parameters.default, org.scalacheck.rng.Seed(37L))
    var checked = 0
    def assertAgrees(corpus: Seq[(Long, Seq[String])], stage: String): Unit =
      nodes.foreach { node =>
        val q = render(node)
        val got =
          try Some(idx.booleanSearch(q, 1000).collect().map(_.getLong(0)).toSet)
          catch { case e: IllegalArgumentException
            if e.getMessage.contains("complement") => None } // pure-NOT: rejected by design
        got.foreach { ids =>
          val want = corpus.collect { case (id, ts) if evalRef(node, ts) => id }.toSet
          assert(ids === want, s"[$stage] query $q: index=$ids ref=$want")
          checked += 1
        }
      }
    assertAgrees(initial, "base")

    // merge 1: delete every 4th doc, append 15 fresh ones past the HWM —
    // queries now answer from base ⊕ delta with tombstones over the base
    val deleted = initial.map(_._1).filter(_ % 4 == 0).toSet
    val appended = mkDocs(51 to 65)
    val newDf = appended.map { case (id, ts) => (id, punctJoin(rnd, ts)) }
      .toDF("chunkId", "indexedData").persist()
    newDf.count()
    idx.updateIncremental(
      df0.filter(col("chunkId") % 4 === 0)
        .select(col("chunkId").as("docId"), col("indexedData")),
      newDf)
    val afterUpdate = initial.filterNot(d => deleted(d._1)) ++ appended
    assertAgrees(afterUpdate, "after-update")

    // merge 2: pure delete of DELTA-resident docs — tombstones must suppress
    // postings AND positional rows that live in delta segments, not the base
    val deleted2 = appended.map(_._1).filter(_ % 3 == 0).toSet
    idx.updateIncremental(
      newDf.filter(col("chunkId") % 3 === 0)
        .select(col("chunkId").as("docId"), col("indexedData")),
      newDf.limit(0))
    val afterDelete = afterUpdate.filterNot(d => deleted2(d._1))
    assertAgrees(afterDelete, "after-delete")

    // compaction folds the tail (postings, stats, positions) into a fresh
    // base — answers must not move
    idx.compact()
    assertAgrees(afterDelete, "after-compact")
    assert(idx.tailBytes === 0L)
    assert(checked >= 40, s"too few non-complement samples ($checked) — regenerate")
  }

  test("punctuated QUERY atoms: compound atoms normalize like FTS5 on scan AND index paths") {
    // r16 ADVICE class: `parse` only lowercases, so a punctuated atom like
    // `ax-by` must re-tokenize (Term → AND of its tokens, phrase/NEAR words
    // flatMap, anchored compounds anchor as phrases) before it can match the
    // engine-tokenized text. The EXPECTED node is built INDEPENDENTLY of
    // QueryLang.normalize — each generator emits (query node with compound
    // words, hand-expanded expectation) in tandem — so the property checks
    // the documented expansion, not the implementation against itself.
    val genWordPair: Gen[(String, Seq[String])] = Gen.frequency(
      3 -> genWord.map(w => (w, Seq(w))),
      2 -> (for { a <- genWord; b <- genWord } yield (s"$a-$b", Seq(a, b))))
    def flatten(ps: Seq[(String, Seq[String])]): (Seq[String], Seq[String]) =
      (ps.map(_._1), ps.flatMap(_._2))
    val genTermPair: Gen[(Node, Node)] = genWordPair.map { case (qw, ts) =>
      (Term(qw), ts.map(Term(_): Node).reduceLeft(And(_, _))) }
    val genPhrasePair: Gen[(Node, Node)] = for {
      n  <- Gen.choose(2, 3)
      ps <- Gen.listOfN(n, genWordPair)
      lp <- Gen.oneOf(true, false)
    } yield {
      val (qws, ts) = flatten(ps)
      (Phrase(qws, lp), Phrase(ts, lp))
    }
    val genFirstPair: Gen[(Node, Node)] = genWordPair.map { case (qw, ts) =>
      (First(Term(qw)),
        First(if (ts.size == 1) Term(ts.head) else Phrase(ts))) }
    val genNearPair: Gen[(Node, Node)] = for {
      k  <- Gen.choose(1, 3)
      ops <- Gen.listOfN(k, genWordPair.map { case (qw, ts) =>
        (NearOp(Seq(qw)), NearOp(ts)) })
      maxLen = ops.map(_._2.words.size).max
      w  <- Gen.choose(maxLen, maxLen + 6)
    } yield (Near(ops.map(_._1), w), Near(ops.map(_._2), w))
    val genAtomPair: Gen[(Node, Node)] = Gen.frequency(
      4 -> genTermPair, 2 -> genPhrasePair, 2 -> genNearPair, 1 -> genFirstPair)
    def genPair(depth: Int): Gen[(Node, Node)] =
      if (depth <= 0) genAtomPair
      else Gen.frequency(
        3 -> genAtomPair,
        2 -> (for { l <- genPair(depth - 1); r <- genPair(depth - 1) }
          yield (And(l._1, r._1), And(l._2, r._2))),
        2 -> (for { l <- genPair(depth - 1); r <- genPair(depth - 1) }
          yield (Or(l._1, r._1), Or(l._2, r._2))),
        1 -> genPair(depth - 1).map(p => (Not(p._1), Not(p._2))))

    val rnd = new scala.util.Random(53)
    val docs = (1 to 60).map { i =>
      val n = rnd.nextInt(11)
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))))
    }
    val df = docs.map { case (id, ts) => (id, punctJoin(rnd, ts)) }
      .toDF("doc_id", "text")
    val idxDf = df.select(col("doc_id").as("chunkId"), col("text").as("indexedData"))
    val dir = java.nio.file.Files.createTempDirectory("graft-qlprop-punct").toString
    val idx = new graft.operators.Bm25Indexer(spark, dir, chunksPath = s"$dir/unused")
    idx.index(idxDf)
    idx.buildPhraseIndex(idxDf)
    val pairs = Gen.listOfN(25, genPair(2)).pureApply(
      org.scalacheck.Gen.Parameters.default, org.scalacheck.rng.Seed(59L))
    val byId = docs.toMap
    var checked = 0
    pairs.foreach { case (queryNode, expectedNode) =>
      val q = render(queryNode)
      val want = docs.collect { case (id, ts) if evalRef(expectedNode, ts) => id }.toSet
      // scan path: booleanSearch normalizes internally (the production route)
      val scanIds =
        try Some(QueryLang.booleanSearch(df, "doc_id", "text", q, 1000)
          .collect().map(_.getLong(0)).toSet)
        catch { case e: IllegalArgumentException
          if e.getMessage.contains("complement") => None }
      scanIds.foreach { ids =>
        assert(ids === want, s"scan query $q: got=$ids ref=$want")
      }
      // index path agrees on the same compound query
      val idxIds =
        try Some(idx.booleanSearch(q, 1000).collect().map(_.getLong(0)).toSet)
        catch { case e: IllegalArgumentException
          if e.getMessage.contains("complement") => None }
      idxIds.foreach { ids =>
        assert(ids === want, s"index query $q: got=$ids ref=$want")
        checked += 1
      }
    }
    assert(checked >= 15, s"too few non-complement samples ($checked) — regenerate")
  }

  test("parser fuzz: arbitrary input parses or raises IllegalArgumentException — never hangs or escapes") {
    val chars = Gen.oneOf(('a' to 'e') ++ Seq(' ', '"', '(', ')', ',', '*', '^', '1', '5'))
    val genRaw = Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, chars).map(_.mkString))
    val prop = Prop.forAll(genRaw) { q =>
      try { parse(q); true } catch { case _: IllegalArgumentException => true }
    }
    val res = check(Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("parser fuzz at the token level: keyword/operator soup parses or raises cleanly") {
    // character soup rarely forms keywords — this variant draws whole
    // tokens, hammering the NEAR/NOT/paren/window/anchor code paths
    val tok = Gen.oneOf(
      "AND", "OR", "NOT", "NEAR", "near", "(", ")", ",", "\"", "*", "^",
      "ax", "bx", "5", "-3", "\"ax bx\"", "\"ax bx\"*", "ax*", "^ax", "NEAR(ax bx, 4)")
    val genQ = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, tok).map(_.mkString(" ")))
    val prop = Prop.forAll(genQ) { q =>
      try { parse(q); true } catch { case _: IllegalArgumentException => true }
    }
    val res = check(Parameters.default.withMinSuccessfulTests(800), prop)
    assert(res.passed, res.status.toString)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SuffixArray

/** Prefix-doubling suffix array + ExactSubstr duplicate spans: hand-checked
  * orders, brute-force parity (ranks AND classes), boundary/truncation
  * cases, and partition invariance of the two-pass global dense rank.
  */
class SuffixArraySpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def df(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")

  /** Brute-force 1-based dense rank of each suffix's first `len` chars. */
  private def bruteRanks(rows: Seq[(Long, String)], len: Int): Map[(Long, Int), Long] = {
    val sufs = for ((id, t) <- rows; off <- 0 until t.length)
      yield ((id, off), t.substring(off, math.min(t.length, off + len)))
    val order = sufs.map(_._2).distinct.sorted.zipWithIndex.toMap
    sufs.map { case (k, s) => k -> (order(s) + 1L) }.toMap
  }

  test("banana: the classic hand-checked suffix array") {
    val sa = SuffixArray.suffixArray(df(1L -> "banana"), "doc_id", "text")
      .orderBy("sa_rank").select("off").as[Int].collect().toSeq
    // suffixes sorted: a(5) ana(3) anana(1) banana(0) na(4) nana(2)
    assert(sa === Seq(5, 3, 1, 0, 4, 2))
  }

  test("suffix array ranks are a permutation of 1..n; equal suffixes tie-break by (id, off)") {
    val d = df(1L -> "abcab", 2L -> "cab", 3L -> "")
    val rows = SuffixArray.suffixArray(d, "doc_id", "text")
      .orderBy("sa_rank")
      .select(col("doc_id"), col("off"), col("sa_rank"))
      .as[(Long, Int, Long)].collect().toSeq
    assert(rows.map(_._3) === (1L to 8L))
    // ab(1,3)=ab(2,1) < abcab < b(1,4)=b(2,2) < bcab < cab(1,2)=cab(2,0);
    // ties order by (id, off); "" (doc3) contributes nothing.
    val expect = Seq((1L, 3), (2L, 1), (1L, 0), (1L, 4), (2L, 2), (1L, 1), (1L, 2), (2L, 0))
    assert(rows.map(r => (r._1, r._2)) === expect)
  }

  test("prefixRanks equals brute-force truncated-suffix dense rank (incl. non-power-of-2 widths)") {
    val rnd = new scala.util.Random(7L)
    val rows = (0 until 30).map { i =>
      i.toLong -> Seq.fill(5 + rnd.nextInt(40))("abcd".charAt(rnd.nextInt(4))).mkString
    }
    for (len <- Seq(1, 2, 5, 7, 16)) {
      val got = SuffixArray.prefixRanks(df(rows: _*), "doc_id", "text", len)
        .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
      assert(got === bruteRanks(rows, len), s"width $len")
    }
    // widths past the packed-seed tiers: 20/90 seed AT the literal width
    // (zero rounds), 160/200 seed at 128 then one overlapping exact round —
    // the round-11 wide-literal-seed path, pinned against brute force on
    // docs long enough (up to ~300 chars) that full-width windows exist
    val longRows = (0 until 12).map { i =>
      i.toLong -> Seq.fill(30 + rnd.nextInt(280))("ab".charAt(rnd.nextInt(2))).mkString
    }
    for (len <- Seq(20, 90, 160, 200)) {
      val got = SuffixArray.prefixRanks(df(longRows: _*), "doc_id", "text", len)
        .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
      assert(got === bruteRanks(longRows, len), s"width $len")
    }
  }

  test("duplicateSpans: planted cross-doc substring found, merged, exact bounds") {
    val planted = "XQWERTYUIOPASDFGHJKLZXCVBNMQX" // 29 chars, unique letters region
    val d = df(
      1L -> s"aaaa${planted}bbbb",
      2L -> s"cccccc${planted}dddd",
      3L -> "nothing shared here at all....")
    val spans = SuffixArray.duplicateSpans(d, "doc_id", "text", minLen = 20)
      .orderBy("doc_id")
      .select("doc_id", "span_start", "span_end", "n_grams")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // Every length-20 window inside the planted 29-char region is shared:
    // starts 4..13 in doc1 (span [4, 33)), 6..15 in doc2 (span [6, 35)).
    assert(spans === Seq((1L, 4L, 33L, 10L), (2L, 6L, 35L, 10L)))
  }

  test("duplicateSpans: within-doc repeat counts by default, excluded by crossDocOnly") {
    val rep = "ABCDEFGHIJKLMNOPQRST" // 20 chars
    val d = df(1L -> s"$rep-junkjunk-$rep", 2L -> "totally unrelated text 123456")
    val dflt = SuffixArray.duplicateSpans(d, "doc_id", "text", minLen = 20)
      .select("doc_id", "span_start", "span_end")
      .as[(Long, Long, Long)].collect().toSet
    assert(dflt === Set((1L, 0L, 20L), (1L, 30L, 50L)))
    val cross = SuffixArray.duplicateSpans(d, "doc_id", "text", minLen = 20,
      crossDocOnly = true)
    assert(cross.isEmpty, "within-doc repeat must not fire crossDocOnly")
  }

  test("duplicateSpans: overlapping duplicated windows merge into one maximal span") {
    // Runs of one character: every 10-gram repeats, so per-window spans
    // overlap everywhere and must merge to one maximal span per doc.
    val a = "MMMMMMMMMMMMMMMMMMMMMMMMM" // 25 of M
    val d = df(1L -> a, 2L -> (a + a)) // doc2: 50 M's, all windows repeat
    val spans = SuffixArray.duplicateSpans(d, "doc_id", "text", minLen = 10)
      .select("doc_id", "span_start", "span_end")
      .as[(Long, Long, Long)].collect().toSet
    assert(spans === Set((1L, 0L, 25L), (2L, 0L, 50L)))
  }

  test("docs shorter than minLen never produce spans; empty corpus yields empty results") {
    val d = df(1L -> "tiny", 2L -> "also small")
    assert(SuffixArray.duplicateSpans(d, "doc_id", "text", minLen = 15).isEmpty)
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(SuffixArray.suffixArray(empty, "doc_id", "text").isEmpty)
  }

  test("non-ASCII / NUL corpora take the width-1 seed fallback and still rank exactly") {
    // 'é'/'ö'/'π' (BMP, code > 127) and NUL each defeat the 7-bit packed
    // seed; asciiSeedSafe must route these to the width-1 seed, where ranks
    // come out identical to brute force anyway (codepoint order == Java char
    // order for BMP text).
    val rows = Seq(1L -> "héllo wörld", 2L -> "héllo wérld",
      3L -> "πππ ascii πππ", 4L -> "plain ascii", 5L -> "a\u0000b\u0000a")
    for (len <- Seq(1, 3, 9, 12)) {
      val got = SuffixArray.prefixRanks(df(rows: _*), "doc_id", "text", len)
        .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
      assert(got === bruteRanks(rows, len), s"width $len")
    }
  }

  test("direct and suffix-rank span paths agree exactly (dup + contaminated)") {
    // 2-letter alphabet: ~1000 windows over 2^12 possible 12-grams makes
    // repeats (within-doc, cross-doc, and train∩bench) statistically certain.
    val rnd = new scala.util.Random(23L)
    val rows = (0 until 25).map { i =>
      i.toLong -> Seq.fill(30 + rnd.nextInt(40))("ab".charAt(rnd.nextInt(2))).mkString
    }
    val d = df(rows: _*)
    for (cross <- Seq(false, true)) {
      val direct = SuffixArray.duplicateSpans(d, "doc_id", "text",
          minLen = 12, crossDocOnly = cross)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val ranked = SuffixArray.duplicateSpans(d, "doc_id", "text",
          minLen = 12, crossDocOnly = cross, directMaxLen = 0)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(direct === ranked, s"crossDocOnly=$cross")
      assert(direct.nonEmpty, "fixture should produce spans")
    }
    val train = df(rows.take(15): _*); val bench = df(rows.drop(15): _*)
    val directC = SuffixArray.contaminatedSpans(train, bench, "doc_id", "text", minLen = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val rankedC = SuffixArray.contaminatedSpans(train, bench, "doc_id", "text",
        minLen = 12, directMaxLen = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(directC === rankedC)
    assert(directC.nonEmpty, "fixture should produce contaminated spans")
  }

  test("stripSpans: head/middle/tail cuts, untouched docs, full-doc removal") {
    import org.apache.spark.sql.functions.{col, lit}
    val docs = df(1L -> "0123456789", 2L -> "abcdef", 3L -> "wxyz")
    val spans = Seq(
      (1L, 0L, 2L),  // head
      (1L, 4L, 6L),  // middle
      (1L, 8L, 10L), // tail
      (3L, 0L, 4L))  // whole doc
      .toDF("doc_id", "span_start", "span_end")
    val out = SuffixArray.stripSpans(docs, spans, "doc_id", "text")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "2367", 2L -> "abcdef", 3L -> ""))
    // Round-trip with the detector: stripping ALL duplicate spans leaves no
    // cross-doc 10-char window behind.
    val dd = df(10L -> "aaaaSHAREDWINDOW24!bbbb", 11L -> "cccSHAREDWINDOW24!dd")
    val detected = SuffixArray.duplicateSpans(dd, "doc_id", "text",
      minLen = 10, crossDocOnly = true)
    val cleaned = SuffixArray.stripSpans(dd, detected, "doc_id", "text")
    assert(SuffixArray.duplicateSpans(cleaned, "doc_id", "text",
      minLen = 10, crossDocOnly = true).isEmpty)
  }

  test("exact-duplicate documents force the plateau exit; SA stays exact") {
    // Docs 1 and 2 are byte-identical: every suffix pair across them is
    // equal FOREVER, so the all-distinct exit can never fire and the
    // doubling must stop via the plateau (unchanged-partition) exit instead
    // of running to max document length.
    val t = "the same exact document body repeated verbatim"
    val d = df(1L -> t, 2L -> t, 3L -> "another unrelated body entirely")
    val got = SuffixArray.suffixArray(d, "doc_id", "text")
      .orderBy("sa_rank")
      .select("doc_id", "off").as[(Long, Int)].collect().toSeq
    val expect = (for ((id, s) <- Seq(1L -> t, 2L -> t,
        3L -> "another unrelated body entirely"); off <- 0 until s.length)
      yield (s.substring(off), id, off)).sorted.map { case (_, id, off) => (id, off) }
    assert(got === expect)
  }

  test("contaminatedSpans: only train∩bench overlap fires; train-train repeats do not") {
    val planted = "EVALBENCHMARKQUESTIONTEXT" // 25 chars
    val trainRep = "TRAINONLYREPEATEDSTRINGS!" // repeats within train only
    // Flanks differ on both sides so the shared substring is EXACTLY the
    // 25-char planted region (shared flanking chars would widen the span).
    val train = df(
      1L -> s"alpha.$planted,omega",
      2L -> s"$trainRep bridge $trainRep",
      3L -> "clean document with nothing shared")
    val bench = df(10L -> s"qq_$planted-zz")
    val spans = SuffixArray.contaminatedSpans(train, bench, "doc_id", "text", minLen = 20)
      .select("doc_id", "span_start", "span_end")
      .as[(Long, Long, Long)].collect().toSet
    // Doc 1: the planted 25-char region starts at 6 → windows 6..11 merge to
    // [6, 31). Doc 2's within-train repeat must NOT fire (no bench member).
    assert(spans === Set((1L, 6L, 31L)))
  }

  test("lcpArray: banana hand-check, cap semantics") {
    // SA order: a ana anana banana na nana → adjacent LCPs 1, 3, 0, 0, 2.
    val got = SuffixArray.lcpArray(df(1L -> "banana"), "doc_id", "text")
      .orderBy("sa_rank").select("sa_rank", "lcp")
      .as[(Long, Long)].collect().toSeq
    assert(got === Seq((2L, 1L), (3L, 3L), (4L, 0L), (5L, 0L), (6L, 2L)))
    val capped = SuffixArray.lcpArray(df(1L -> "banana"), "doc_id", "text", maxLcp = 2)
      .orderBy("sa_rank").select("lcp").as[Long].collect().toSeq
    assert(capped === Seq(1L, 2L, 0L, 0L, 2L))
  }

  test("lcpArray(sa = prebuilt) equals the self-building overload") {
    val rnd = new scala.util.Random(7L)
    val rows = (0 until 12).map { i =>
      i.toLong -> Seq.fill(6 + rnd.nextInt(20))("abz".charAt(rnd.nextInt(3))).mkString
    }
    val docs = df(rows: _*)
    val sa = SuffixArray.suffixArray(docs, "doc_id", "text")
    val viaSeam = SuffixArray.lcpArray(docs, sa, "doc_id", "text", 64)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val direct = SuffixArray.lcpArray(docs, "doc_id", "text", maxLcp = 64)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(viaSeam === direct)
  }

  test("lcpArray equals brute force over a random multi-doc corpus") {
    val rnd = new scala.util.Random(13L)
    val rows = (0 until 20).map { i =>
      i.toLong -> Seq.fill(8 + rnd.nextInt(25))("abc".charAt(rnd.nextInt(3))).mkString
    }
    val sufs = (for ((id, t) <- rows; off <- 0 until t.length)
      yield (t.substring(off), id, off)).sorted
    val want = sufs.sliding(2).zipWithIndex.map { case (Seq(p, c), i) =>
      (c._2, c._3, i + 2L) -> p._1.zip(c._1).takeWhile { case (x, y) => x == y }.size.toLong
    }.toMap
    val got = SuffixArray.lcpArray(df(rows: _*), "doc_id", "text", maxLcp = 1000)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)) -> r.getLong(3)).toMap
    assert(got === want)
  }

  test("CommonPrefixLength counts codepoints and never splits one") {
    val cases = Seq(
      ("abc", "abd", 2L), ("abc", "abc", 3L), ("", "abc", 0L),
      ("aé", "aè", 1L), // é=C3A9 vs è=C3A8 share a lead byte: partial char excluded
      ("aéx", "aéy", 2L), ("banana", "bananas", 6L))
    for ((a, b, want) <- cases) {
      val got = Seq((a, b)).toDF("a", "b")
        .select(graft.plans.TextHashFunctions.commonPrefixLength(col("a"), col("b")))
        .as[Long].head()
      assert(got === want, s"lcp($a, $b)")
    }
  }

  test("property: prefixRanks equals brute force on random corpora (both seed paths)") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    // Mostly-ASCII docs with an occasional 'é' so generated cases land on
    // BOTH the packed seed and the width-1 fallback; empty docs included.
    val charGen = Gen.frequency(12 -> Gen.oneOf('a', 'b', 'z'), 1 -> Gen.const('é'))
    val docGen = Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, charGen).map(_.mkString))
    val corpusGen = for {
      n <- Gen.choose(3, 10)
      ds <- Gen.listOfN(n, docGen)
      w <- Gen.choose(1, 20)
    } yield (ds.zipWithIndex.map { case (t, i) => i.toLong -> t }, w)
    val prop = Prop.forAll(corpusGen) { case (rows, w) =>
      val got = SuffixArray.prefixRanks(df(rows: _*), "doc_id", "text", w)
        .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
      got == bruteRanks(rows, w)
    }
    val res = check(Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: direct and rank span paths agree on random repeat-dense corpora") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    val docGen = Gen.choose(8, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b')).map(_.mkString))
    val caseGen = for {
      n <- Gen.choose(4, 8)
      ds <- Gen.listOfN(n, docGen)
      l <- Gen.choose(4, 10)
      cross <- Gen.oneOf(true, false)
    } yield (ds.zipWithIndex.map { case (t, i) => i.toLong -> t }, l, cross)
    val prop = Prop.forAll(caseGen) { case (rows, l, cross) =>
      val d = df(rows: _*)
      val direct = SuffixArray.duplicateSpans(d, "doc_id", "text", l, cross)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val ranked = SuffixArray.duplicateSpans(d, "doc_id", "text", l, cross,
          directMaxLen = 0)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      direct == ranked
    }
    val res = check(Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  // ---- sharded runs: exact equality with the global functions ------------

  private def spanSet(d: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long)] =
    d.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  test("shardedDuplicateSpans: planted CROSS-SHARD long duplicates equal the global rank path") {
    // 200-char duplicated block (> DirectWindowMaxLen forces the rank path
    // and real sharding) planted into six docs; with nShards = 3 the copies
    // provably straddle shards (asserted, not assumed). Plus a within-doc
    // repeat and unique filler docs.
    val block = (0 until 200).map(i => "abcd".charAt((i * 7 + i / 9) % 4)).mkString
    val filler = (id: Long) => s"unique filler for document $id " * 12
    val rows: Seq[(Long, String)] =
      (1L to 6L).map(i => i -> (filler(i).take(30 + 7 * i.toInt) + block + filler(i + 100))) ++
      Seq(7L -> (block.take(180) + "ZZZ" + block.take(180)), // within-doc repeat < minLen of others
          8L -> filler(8), 9L -> filler(9), 10L -> filler(10))
    val d = df(rows: _*)
    val nShards = 3
    val shards = d.select(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.hash(col("doc_id")),
        lit(nShards)).as("s"))
      .where(col("doc_id").isNotNull).distinct().collect().map(_.getInt(0)).toSet
    // the fixture must actually exercise the cross-shard seam
    assert(shards.size >= 2, s"fixture docs all hashed to one shard: $shards")
    for (cross <- Seq(false, true)) {
      val global = spanSet(SuffixArray.duplicateSpans(
        d, "doc_id", "text", minLen = 160, crossDocOnly = cross))
      val sharded = spanSet(SuffixArray.shardedDuplicateSpans(
        d, "doc_id", "text", minLen = 160, crossDocOnly = cross, nShards = nShards,
        shardParallelism = 4)) // keep the opt-in concurrent path covered
      assert(sharded === global, s"crossDocOnly=$cross")
      assert(global.nonEmpty)
    }
  }

  test("shardedDuplicateSpans equals global on repeat-dense random corpora (forced small seed)") {
    // 2-letter alphabet, minLen 12 > directMaxLen 4: every per-shard run is
    // a rank run, the seed pass is width-4 (seeds everywhere → the auxiliary
    // group degenerates toward the full corpus — exactness must hold there too)
    for (seed <- Seq(23L, 57L)) {
      val rnd = new scala.util.Random(seed)
      val rows = (0 until 25).map { i =>
        i.toLong -> Seq.fill(30 + rnd.nextInt(40))("ab".charAt(rnd.nextInt(2))).mkString
      }
      val d = df(rows: _*)
      for (cross <- Seq(false, true)) {
        val global = spanSet(SuffixArray.duplicateSpans(
          d, "doc_id", "text", minLen = 12, crossDocOnly = cross))
        val sharded = spanSet(SuffixArray.shardedDuplicateSpans(
          d, "doc_id", "text", minLen = 12, crossDocOnly = cross,
          nShards = 3, directMaxLen = 4))
        assert(sharded === global, s"seed=$seed crossDocOnly=$cross")
        assert(global.nonEmpty)
      }
    }
  }

  test("shardedContaminatedSpans equals global (train shards × whole bench)") {
    val rnd = new scala.util.Random(23L)
    val rows = (0 until 25).map { i =>
      i.toLong -> Seq.fill(30 + rnd.nextInt(40))("ab".charAt(rnd.nextInt(2))).mkString
    }
    val train = df(rows.take(15): _*); val bench = df(rows.drop(15): _*)
    val global = spanSet(SuffixArray.contaminatedSpans(
      train, bench, "doc_id", "text", minLen = 12, directMaxLen = 4))
    val sharded = spanSet(SuffixArray.shardedContaminatedSpans(
      train, bench, "doc_id", "text", minLen = 12, nShards = 4, directMaxLen = 4,
      shardParallelism = 4)) // keep the opt-in concurrent path covered
    assert(sharded === global)
    assert(global.nonEmpty)
    // long planted contamination through the DEFAULT seed width (128)
    val block = (0 until 300).map(i => "wxyz".charAt((i * 5 + i / 7) % 4)).mkString
    val tr2 = df(1L -> ("prefix " + block + " suffix"), 2L -> ("clean doc " * 30))
    val be2 = df(9L -> ("bench carries " + block))
    val g2 = spanSet(SuffixArray.contaminatedSpans(tr2, be2, "doc_id", "text", minLen = 200))
    val s2 = spanSet(SuffixArray.shardedContaminatedSpans(
      tr2, be2, "doc_id", "text", minLen = 200, nShards = 3))
    assert(s2 === g2)
    assert(g2.nonEmpty)
  }

  test("sharded runs delegate when sharding cannot help (nShards=1, direct-path minLen)") {
    val d = df(1L -> ("dup dup dup shared segment here " * 4),
               2L -> ("shared segment here also in two " * 4))
    val g = spanSet(SuffixArray.duplicateSpans(d, "doc_id", "text", minLen = 16))
    assert(spanSet(SuffixArray.shardedDuplicateSpans(
      d, "doc_id", "text", minLen = 16, nShards = 1)) === g)
    assert(spanSet(SuffixArray.shardedDuplicateSpans(
      d, "doc_id", "text", minLen = 16, nShards = 5)) === g) // minLen ≤ direct → global direct
    val g2 = spanSet(SuffixArray.contaminatedSpans(
      d.limit(1), d, "doc_id", "text", minLen = 16))
    assert(spanSet(SuffixArray.shardedContaminatedSpans(
      d.limit(1), d, "doc_id", "text", minLen = 16, nShards = 5)) === g2)
  }

  test("partition invariance: ranks identical regardless of input partitioning") {
    val rnd = new scala.util.Random(41L)
    val rows = (0 until 25).map { i =>
      i.toLong -> Seq.fill(10 + rnd.nextInt(30))("xyz".charAt(rnd.nextInt(3))).mkString
    }
    val one = SuffixArray.suffixArray(df(rows: _*).repartition(1), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val many = SuffixArray.suffixArray(df(rows: _*).repartition(7), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(one === many)
  }
}

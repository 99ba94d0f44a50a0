package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{LegacyChroma, Pickle}
import scala.collection.mutable

/** From-scratch pickle/tar codecs against REAL CPython artifacts: the golden
  * fixtures under src/test/resources were produced by CPython's pickle and
  * tarfile modules in the exact shapes the reference's migration path handles
  * (FIXTURES.md §legacy). The gated query `m7_legacy_import` additionally
  * hash-gates the full export→import roundtrip against DuckDB at sf scale.
  */
class LegacyChromaSpec extends AnyFunSuite with SparkSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/$name")
    assert(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  test("pickle roundtrip preserves a nested dict/list/scalar tree") {
    val tree = mutable.LinkedHashMap[Any, Any](
      "ids" -> mutable.ArrayBuffer[Any]("0", "1"),
      "nested" -> mutable.ArrayBuffer[Any](
        mutable.LinkedHashMap[Any, Any]("a" -> 1L, "b" -> null, "c" -> true),
        mutable.ArrayBuffer[Any](1.5, -2.25, 3.0)),
      "big" -> 1099511627776L, "neg" -> -123456L, "f" -> 0.1,
      "s" -> "ünïcode ✓", "none" -> null, "no" -> false)
    val loaded = Pickle.load(Pickle.dump(tree)).asInstanceOf[mutable.LinkedHashMap[Any, Any]]
    assert(loaded("ids").asInstanceOf[mutable.ArrayBuffer[Any]].toSeq === Seq("0", "1"))
    val nested = loaded("nested").asInstanceOf[mutable.ArrayBuffer[Any]]
    assert(nested(0).asInstanceOf[mutable.LinkedHashMap[Any, Any]].toSeq ===
      Seq("a" -> 1L, "b" -> null, "c" -> true))
    assert(nested(1).asInstanceOf[mutable.ArrayBuffer[Any]].toSeq === Seq(1.5, -2.25, 3.0))
    assert(loaded("big") === 1099511627776L && loaded("neg") === -123456L)
    assert(loaded("f") === 0.1 && loaded("s") === "ünïcode ✓")
    assert(loaded("none") == null && loaded("no") === false)
  }

  test("CPython golden pickles decode identically at protocols 2, 4 and 5") {
    for (proto <- Seq(2, 4, 5)) {
      val entries = LegacyChroma.decodePickled(fixture(s"legacy_proto$proto.pkl"))
      assert(entries.map(_.id) === Seq("0", "1", "2"), s"proto $proto ids")
      assert(entries(0).embedding.toSeq === Seq(0.25f, -1.5f, 3.0f))
      assert(entries(1).embedding.toSeq === Seq(1.0f, 2.0f, -0.125f))
      assert(entries(2).embedding.toSeq === Seq(-7.75f, 0.0f, 42.0f))
      // metadata rendering: epoch ints, bools, None→"None", unicode, 2^40, negatives
      assert(entries(0).metadata === Map(
        "source" -> "old", "lastModifiedAt" -> "1735689600", "flag" -> "true"))
      assert(entries(1).metadata === Map(
        "source" -> "ünïcode ✓", "note" -> "None", "score" -> "0.75"))
      assert(entries(2).metadata === Map(
        "source" -> "big", "n" -> "1099511627776", "neg" -> "-123456"))
    }
  }

  test("imported legacy frame is directly searchable") {
    val df = LegacyChroma.importPickled(spark, fixture("legacy_proto4.pkl"))
    assert(df.count() === 3)
    val hit = graft.operators.Search.vectorTopK(
        df, "embedding", Array(1.0f, 2.0f, -0.1f), k = 1, idCol = "id")
      .select("id").head().getString(0)
    assert(hit === "1")
  }

  test("export → CPython-shape pickle → import is identity on a DataFrame") {
    import spark.implicits._
    val df = Seq(
      ("10", Array(0.5f, -0.5f), Map("source" -> "ours", "note" -> "None")),
      ("11", Array(1.25f, 2.5f), Map("source" -> "ours")))
      .toDF("id", "embedding", "metadata")
    val back = LegacyChroma.decodePickled(LegacyChroma.exportPickled(df))
    assert(back.map(_.id) === Seq("10", "11"))
    assert(back(0).embedding.toSeq === Seq(0.5f, -0.5f))
    assert(back(1).embedding.toSeq === Seq(1.25f, 2.5f))
    assert(back(0).metadata === Map("source" -> "ours", "note" -> "None"))
  }

  test("archive form: magic detected, members listed, extraction lands under root") {
    val bytes = fixture("legacy_archive.bin")
    assert(LegacyChroma.isArchive(bytes))
    assert(!LegacyChroma.isArchive(fixture("legacy_proto2.pkl")))
    val entries = LegacyChroma.listArchive(bytes)
    assert(entries.map(e => e.name -> e.size).toSet === Set(
      "chroma.sqlite3" -> 17L, "idx/header.bin" -> 11L, "idx/data_level0.bin" -> 1024L))
    val dir = java.nio.file.Files.createTempDirectory("legacy-extract").toString
    LegacyChroma.extractArchive(bytes, dir)
    val sqlite = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "chroma.sqlite3"))
    assert(new String(sqlite) === "sqlite-bytes-here")
    assert(new java.io.File(dir, "idx/data_level0.bin").length() === 1024L)
    // pickle decode refuses the archive form with a pointer to the right path
    val err = intercept[IllegalArgumentException] { LegacyChroma.decodePickled(bytes) }
    assert(err.getMessage.contains("archive-form"))
  }

  test("property: pickle roundtrip is identity over random value trees") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    val scalar: Gen[Any] = Gen.oneOf(
      Gen.const(null), Gen.oneOf(true, false),
      Gen.choose(Long.MinValue, Long.MaxValue).map(l => l: Any),
      Gen.choose(-1e6, 1e6).map(d => d: Any),
      Gen.choose(0, 300).map(_.toLong: Any), // the BININT1/BININT2 paths
      Gen.listOfN(8, Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('ü', '✓', '«')))
        .map(_.mkString: Any))
    def tree(depth: Int): Gen[Any] =
      if (depth == 0) scalar
      else Gen.frequency(
        3 -> scalar,
        1 -> Gen.choose(0, 5).flatMap(n => Gen.listOfN(n, tree(depth - 1)))
          .map(l => mutable.ArrayBuffer[Any](l: _*): Any),
        1 -> Gen.choose(0, 5).flatMap(n => Gen.listOfN(n,
            Gen.zip(Gen.listOfN(6, Gen.alphaNumChar).map(_.mkString), tree(depth - 1))))
          .map(kvs => mutable.LinkedHashMap[Any, Any](kvs: _*): Any))
    def canon(v: Any): Any = v match {
      case b: mutable.ArrayBuffer[_] => b.map(canon).toList
      case m: mutable.LinkedHashMap[_, _] => m.toList.map { case (k, x) => (k, canon(x)) }
      case other => other
    }
    val prop = Prop.forAll(tree(3)) { v =>
      canon(Pickle.load(Pickle.dump(v))) == canon(v)
    }
    val res = check(Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("malformed pickles fail loudly, never hang or return garbage") {
    // truncated mid-stream: every prefix of a valid pickle must throw or
    // return only from a complete STOP — never loop
    val good = Pickle.dump(mutable.LinkedHashMap[Any, Any](
      "ids" -> mutable.ArrayBuffer[Any]("0", "1"), "x" -> 1.5))
    for (n <- 0 until good.length - 1) {
      intercept[Exception] { Pickle.load(java.util.Arrays.copyOfRange(good, 0, n)) }
      ()
    }
    // an unsupported opcode (e.g. GLOBAL 'c' — class instantiation) is
    // rejected by name, not executed: this codec never constructs objects
    val evil = Array[Byte](0x80.toByte, 2, 'c'.toByte) ++
      "os\nsystem\n".getBytes ++ Array[Byte]('.'.toByte)
    val err = intercept[IllegalArgumentException] { Pickle.load(evil) }
    assert(err.getMessage.contains("unsupported pickle opcode"))
    // garbage bytes
    intercept[Exception] { Pickle.load("not a pickle at all".getBytes) }
    ()
  }

  test("archive member escaping the root is refused before anything is written") {
    val dir = java.nio.file.Files.createTempDirectory("legacy-evil").toString
    val err = intercept[IllegalArgumentException] {
      LegacyChroma.extractArchive(fixture("legacy_archive_evil.bin"), dir)
    }
    assert(err.getMessage.contains("Invalid archive entry path"))
    assert(!new java.io.File(new java.io.File(dir).getParentFile, "evil.txt").exists())
  }

  test("CPython pickle of a >64-bit int fails loudly, never truncates") {
    // legacy_bigint.pkl = pickle.dumps({"ids": ["0"], "huge": 2**70}, protocol=2)
    // → LONG1 with a 9-byte body; the codec must refuse, not wrap modulo 2^64.
    val err = intercept[IllegalArgumentException] {
      Pickle.load(fixture("legacy_bigint.pkl"))
    }
    assert(err.getMessage.contains("wider than 64 bits"))
  }

  test("GNU @LongLink members resolve to their real >100-char names") {
    // legacy_archive_gnu.bin: CPython tarfile GNU_FORMAT — the 189-char member
    // path forces a typeflag-'L' longname header before the real member.
    val bytes = fixture("legacy_archive_gnu.bin")
    val longname = "persist/" + "deep_directory_segment/" * 5 + "x" * 40 +
      "/chroma-embeddings.parquet"
    val entries = LegacyChroma.listArchive(bytes)
    assert(entries.map(e => e.name -> e.size).toSet === Set(
      "persist/index_metadata.pickle" -> 4L, longname -> 700L))
    val dir = java.nio.file.Files.createTempDirectory("legacy-gnu").toString
    LegacyChroma.extractArchive(bytes, dir)
    val f = new java.io.File(dir, longname)
    assert(f.length() === 700L)
    assert(java.nio.file.Files.readAllBytes(f.toPath).forall(_ == 'B'.toByte))
  }

  test("pax metadata between @LongLink and its target does not eat the longname") {
    // GNU tar applies a typeflag-'L' longname to the next REAL member; a pax
    // 'x'/'g' (or GNU 'K') metadata member interleaved between them is
    // skipped without consuming it. Build the archive by hand: L → x → file.
    def header(name: String, size: Long, typeflag: Char): Array[Byte] = {
      val h = new Array[Byte](512)
      val nb = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      System.arraycopy(nb, 0, h, 0, math.min(nb.length, 100))
      val sz = ("%011o".format(size) + " ").getBytes
      System.arraycopy(sz, 0, h, 124, sz.length)
      h(156) = typeflag.toByte
      h
    }
    def padded(data: Array[Byte]): Array[Byte] =
      java.util.Arrays.copyOf(data, ((data.length + 511) / 512) * 512)
    val longname = "persist/" + "n" * 120 + "/chroma-embeddings.parquet"
    val paxPayload = "30 mtime=1700000000.000\n".getBytes
    val filePayload = Array.fill[Byte](17)('Z'.toByte)
    val tar = header("././@LongLink", longname.length.toLong, 'L') ++
      padded(longname.getBytes) ++
      header("./PaxHeaders/ignored", paxPayload.length.toLong, 'x') ++
      padded(paxPayload) ++
      header("persist/chroma-embed", filePayload.length.toLong, '0') ++
      padded(filePayload) ++
      new Array[Byte](1024) // end-of-archive
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(LegacyChroma.ArchiveMagic)
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(tar); gz.close()
    val bytes = bos.toByteArray

    val entries = LegacyChroma.listArchive(bytes)
    assert(entries.map(e => e.name -> e.size) === Seq(longname -> 17L))
    val dir = java.nio.file.Files.createTempDirectory("legacy-pax-gnu").toString
    LegacyChroma.extractArchive(bytes, dir)
    val f = new java.io.File(dir, longname)
    assert(f.length() === 17L)
    assert(java.nio.file.Files.readAllBytes(f.toPath).forall(_ == 'Z'.toByte))
  }

  test("a traversal hidden behind @LongLink is refused like a plain one") {
    // The extract-time guard validates the names listArchive resolves — the
    // longname path must flow through the SAME resolution in both passes.
    val dir = java.nio.file.Files.createTempDirectory("legacy-evil-gnu").toString
    val err = intercept[IllegalArgumentException] {
      LegacyChroma.extractArchive(fixture("legacy_archive_evil_longname.bin"), dir)
    }
    assert(err.getMessage.contains("Invalid archive entry path"))
    assert(java.nio.file.Files.list(java.nio.file.Paths.get(dir)).count() === 0L)
  }
}

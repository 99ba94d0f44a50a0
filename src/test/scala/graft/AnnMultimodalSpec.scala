package graft

import graft.operators.{Ann, Multimodal, Search}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AnnMultimodalSpec extends AnyFunSuite with SparkSuite {

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val queryVec = emb.filter(col("vec_id") === 0)
    .head().getSeq[Float](1).toArray

  test("IVF with nProbe = nLists is exactly brute force") {
    val index = Ann.buildIvf(emb, "embedding", nLists = 8)
    val exact = Search.vectorTopK(emb, "embedding", queryVec, 10, "l2", idCol = "vec_id")
      .select("vec_id").collect().map(_.getLong(0))
    val ivfAll = Ann.searchIvf(index, queryVec, 10, nProbe = 8)
      .select("vec_id").collect().map(_.getLong(0))
    assert(ivfAll === exact)
  }

  test("deterministic IVF: byte-identical across partitionings, exact at full probe") {
    val a = Ann.buildIvfDeterministic(emb.repartition(1), "vec_id", "embedding", nLists = 8)
    val b = Ann.buildIvfDeterministic(emb.repartition(7), "vec_id", "embedding", nLists = 8)
    // centroids byte-identical (MLlib's trainer does NOT guarantee this)
    assert(a.centroids.map(_.toSeq).toSeq === b.centroids.map(_.toSeq).toSeq)
    // and so are the assignments
    val asgA = a.assigned.select("vec_id", "listId").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val asgB = b.assigned.select("vec_id", "listId").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(asgA === asgB)
    // same probe semantics as the MLlib-trained index: full probe = brute force
    val exact = Search.vectorTopK(emb, "embedding", queryVec, 10, "l2", idCol = "vec_id")
      .select("vec_id").collect().map(_.getLong(0))
    val ivfAll = Ann.searchIvf(a, queryVec, 10, nProbe = 8)
      .select("vec_id").collect().map(_.getLong(0))
    assert(ivfAll === exact)
  }

  test("IVF probe subset: cheaper scan, sane recall, results are a subset") {
    val index = Ann.buildIvf(emb, "embedding", nLists = 8, seed = 42L)
    val exact = Search.vectorTopK(emb, "embedding", queryVec, 10, "l2", idCol = "vec_id")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val probed = Ann.searchIvf(index, queryVec, 10, nProbe = 4)
      .select("vec_id").collect().map(_.getLong(0))
    assert(probed.nonEmpty)
    // every probed result must be a true vector (sanity) and the query's own list
    // must be probed first => the single nearest neighbour is found
    val top1 = Search.vectorTopK(emb, "embedding", queryVec, 1, "l2", idCol = "vec_id")
      .head().getLong(0)
    assert(probed.contains(top1))
    assert((probed.toSet -- exact).size <= 10)
  }

  test("sign-LSH multi-probe search returns the bucket-local top-k") {
    val hits = Ann.searchSignLsh(emb, "embedding", queryVec, 5, bits = 6)
      .select("vec_id").collect().map(_.getLong(0))
    assert(hits.length === 5)
    assert(hits.contains(0L)) // the query vector itself shares its own bucket
  }

  test("multimodal: real PNG/JPEG/GIF header decode") {
    import spark.implicits._
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    def render(w: Int, h: Int, fmt: String, imgType: Int = BufferedImage.TYPE_INT_RGB) = {
      val baos = new java.io.ByteArrayOutputStream()
      ImageIO.write(new BufferedImage(w, h, imgType), fmt, baos)
      baos.toByteArray
    }
    val media = Seq(
      ("png", "image", render(13, 7, "png"), Map.empty[String, String]),
      ("png_rgba", "image", render(5, 9, "png", BufferedImage.TYPE_INT_ARGB), Map.empty[String, String]),
      ("jpg", "image", render(31, 17, "jpg"), Map.empty[String, String]),
      ("gif", "image", render(21, 11, "gif"), Map.empty[String, String]))
      .toDF("mediaId", "kind", "bytes", "meta")
    val got = Multimodal.decode(media).collect()
      .map(r => r.getString(0) -> ((r.getAs[Int]("width"), r.getAs[Int]("height"),
        r.getAs[Int]("channels")))).toMap
    assert(got("png") === ((13, 7, 3)))
    assert(got("png_rgba") === ((5, 9, 4)))
    assert(got("jpg") === ((31, 17, 3)))
    assert(got("gif") === ((21, 11, 3)))
  }

  test("multimodal: real nearest-neighbor resize of raw RGB buffers") {
    import spark.implicits._
    // 4×4 gradient: pixel (x,y) = (x*60, y*60, 10)
    val buf = Array.tabulate(4 * 4 * 3) { i =>
      val p = i / 3; val (x, y) = (p % 4, p / 4)
      (i % 3 match { case 0 => x * 60; case 1 => y * 60; case _ => 10 }).toByte
    }
    val media = Seq(
      ("ok", buf, 4, 4),
      ("short", Array.fill(5)(1.toByte), 4, 4), // claims 4×4, lies → null
      // 65536×65536×3 wraps to 0 in Int math — the guard must use Long math
      // and quarantine, not pass and crash on index overflow
      ("overflow", Array.fill(5)(1.toByte), 65536, 65536))
      .toDF("mediaId", "bytes", "width", "height")

    val down = Multimodal.resizeRawRgb(media, dstW = 2, dstH = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    val d = down("ok").getAs[Array[Byte]]("bytes")
    assert(d.length === 2 * 2 * 3)
    // nearest = floor mapping: dst(1,1) ← src(2,2) = (120, 120, 10)
    assert((d(9) & 0xff, d(10) & 0xff, d(11) & 0xff) === ((120, 120, 10)))
    assert(down("ok").getAs[Int]("width") === 2)
    assert(down("short").getAs[Array[Byte]]("bytes") === null) // quarantined
    assert(down("short").getAs[Int]("width") === 4)            // dims untouched
    assert(down("overflow").getAs[Array[Byte]]("bytes") === null)
    assert(down("overflow").getAs[Int]("width") === 65536)

    // upscale replicates pixels; round-trip down-up keeps the corner pixel
    val up = Multimodal.resizeRawRgb(media.filter($"mediaId" === "ok"), 8, 8)
      .head().getAs[Array[Byte]]("bytes")
    assert(up.length === 8 * 8 * 3)
    assert((up(0) & 0xff) === 0 && (up(2) & 0xff) === 10) // (0,0) survives
  }

  test("multimodal: decode stub, features, frame sampling, resize") {
    import spark.implicits._
    val media = Seq(
      ("m1", "image", "fake-image-bytes-000000".getBytes, Map("src" -> "a")),
      ("m2", "audio", "fake-audio-bytes".getBytes, Map.empty[String, String]),
      ("m3", "video", Array.fill(5000)(7.toByte), Map.empty[String, String]),
      ("m4", "image", Array.empty[Byte], Map.empty[String, String]))
      .toDF("mediaId", "kind", "bytes", "meta")

    val decoded = Multimodal.decode(media)
    val img = decoded.filter($"mediaId" === "m1").head()
    assert(img.getAs[Int]("width") > 0 && img.getAs[Int]("height") > 0)
    assert(img.getAs[Int]("channels") === 3)
    // deterministic: same bytes → same dimensions
    val again = Multimodal.decode(media).filter($"mediaId" === "m1").head()
    assert(again.getAs[Int]("width") === img.getAs[Int]("width"))
    val empty = decoded.filter($"mediaId" === "m4").head()
    assert(empty.getAs[Int]("width") === 0)

    val feats = Multimodal.extractFeatures(media, dim = 32)
      .select("mediaId", "features").collect()
      .map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    assert(feats("m1").length === 32)
    val norm = math.sqrt(feats("m1").map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5) // unit vectors compose with cosine ANN
    assert(feats("m4").forall(_ === 0f))

    val frames = Multimodal.sampleFrames(media, frameBytes = 1024, everyNth = 2)
    val fr = frames.collect()
    assert(fr.forall(_.getString(0) === "m3"))
    assert(fr.length === 3) // 5 pseudo-frames, every 2nd => frames 0,2,4
    assert(fr.map(_.getAs[Int]("frameNo")).sorted === Array(0, 1, 2))

    val resized = Multimodal.resizeStub(media, 100)
    assert(resized.select(max(length($"bytes"))).head().getInt(0) <= 100)
  }

  test("batch IVF with nProbe = nLists reproduces exact top-k per query (recall 1.0)") {
    import spark.implicits._
    val index = Ann.buildIvf(emb, "embedding", nLists = 8, seed = 7L)
    val qRows = emb.filter(col("vec_id").between(10, 14)).orderBy("vec_id")
      .collect().map(r => (r.getAs[Long]("vec_id"),
        r.getSeq[Float](1).toArray)).toSeq
    val approx = Ann.searchIvfBatch(index, qRows, k = 5, nProbe = 8)
    val exact = Search.vectorTopKBatch(emb, "embedding", "vec_id",
      qRows.toDF("qid", "qvec"), "qid", "qvec", 5)
    val rec = Ann.recallAtK(approx, exact, "qid", "vec_id", 5).collect()
    assert(rec.length === 5)
    assert(rec.forall(_.getAs[Double]("recall") === 1.0))
  }

  test("recallAtK reports 0 for a query with no overlap instead of dropping it") {
    import spark.implicits._
    val exact = Seq((1L, 10L), (1L, 11L), (2L, 20L)).toDF("qid", "vec_id")
    val approx = Seq((1L, 10L), (2L, 99L)).toDF("qid", "vec_id")
    val rec = Ann.recallAtK(approx, exact, "qid", "vec_id", k = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rec === Map(1L -> 0.5, 2L -> 0.0))
  }

  /** Minimal canonical PCM WAV: RIFF/WAVE + "fmt "(16) + "data"(n). */
  private def wavBytes(channels: Int, rateHz: Int, bits: Int, dataLen: Int,
                       extraChunk: Boolean = false): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(64 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val byteRate = rateHz * channels * bits / 8
    bb.put("RIFF".getBytes); bb.putInt(36 + dataLen); bb.put("WAVE".getBytes)
    if (extraChunk) { // a LIST chunk before fmt — the walk must skip it
      bb.put("LIST".getBytes); bb.putInt(4); bb.put("INFO".getBytes)
    }
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1.toShort); bb.putShort(channels.toShort)
    bb.putInt(rateHz); bb.putInt(byteRate)
    bb.putShort((channels * bits / 8).toShort); bb.putShort(bits.toShort)
    bb.put("data".getBytes); bb.putInt(dataLen); bb.put(new Array[Byte](dataLen))
    java.util.Arrays.copyOf(bb.array(), bb.position())
  }

  test("WAV header decodes for real: channels, rate, duration from RIFF chunks") {
    // 16-bit stereo 8kHz, 32000 data bytes → exactly 1000 ms
    val m = Multimodal.wavMeta(wavBytes(2, 8000, 16, 32000)).get
    assert(m.channels === 2 && m.sampleRateHz === 8000 && m.bitsPerSample === 16)
    assert(m.durationMs === 1000L)
    // chunk walk skips unknown chunks before fmt
    val skipped = Multimodal.wavMeta(wavBytes(1, 16000, 8, 8000, extraChunk = true)).get
    assert(skipped.channels === 1 && skipped.durationMs === 500L)
    // malformed inputs degrade to None, never throw
    assert(Multimodal.wavMeta("RIFFjunk".getBytes).isEmpty)
    assert(Multimodal.wavMeta(wavBytes(1, 8000, 16, 4000).take(30)).isEmpty)
    assert(Multimodal.wavMeta(Array.emptyByteArray).isEmpty)
  }

  test("wavMeta never throws: 300-case fuzz over random and mutated headers") {
    val rnd = new scala.util.Random(20260813L)
    val valid = wavBytes(2, 8000, 16, 256)
    (1 to 300).foreach { i =>
      val bytes =
        if (i % 3 == 0) { // random garbage of random length
          val b = new Array[Byte](rnd.nextInt(200)); rnd.nextBytes(b); b
        } else if (i % 3 == 1) { // valid header, one random byte corrupted
          val b = valid.clone(); b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte; b
        } else valid.take(rnd.nextInt(valid.length)) // random truncation
      Multimodal.wavMeta(bytes) // Option out, never a throw
    }
  }

  /** Minimal ISO BMFF: ftyp + moov(mvhd + optional trak(tkhd) with dims). */
  private def mp4Bytes(timescale: Int, duration: Int, v1: Boolean = false,
                       dims: Option[(Int, Int)] = None): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(512) // big-endian by default
    bb.putInt(16); bb.put("ftypisom".getBytes); bb.putInt(0x200)
    // mvhd payload: v0 = 100 bytes, v1 = 112 (ISO 14496-12 §8.2.2)
    val payloadLen = if (v1) 112 else 100
    val mvhdLen = 8 + payloadLen
    val trakLen = if (dims.isDefined) 8 + 8 + 84 else 0 // trak(tkhd v0: 84)
    val moovStart = bb.position()
    bb.putInt(8 + mvhdLen + trakLen); bb.put("moov".getBytes)
    val mvhdStart = bb.position()
    bb.putInt(mvhdLen); bb.put("mvhd".getBytes)
    if (v1) {
      bb.put(1.toByte); bb.put(new Array[Byte](3)) // version 1, flags
      bb.putLong(0L); bb.putLong(0L)               // creation, modification
      bb.putInt(timescale); bb.putLong(duration.toLong)
    } else {
      bb.putInt(0)                                 // version 0, flags
      bb.putInt(0); bb.putInt(0)                   // creation, modification
      bb.putInt(timescale); bb.putInt(duration)
    }
    bb.put(new Array[Byte](mvhdStart + 8 + payloadLen - bb.position())) // rate..next_track
    dims.foreach { case (w, h) =>
      bb.putInt(8 + 8 + 84); bb.put("trak".getBytes)
      bb.putInt(8 + 84); bb.put("tkhd".getBytes)
      bb.put(new Array[Byte](76))        // v0 fields up to width
      bb.putInt(w << 16); bb.putInt(h << 16) // 16.16 fixed
    }
    assert(bb.position() == moovStart + 8 + mvhdLen + trakLen)
    java.util.Arrays.copyOf(bb.array(), bb.position())
  }

  test("MP4 duration decodes for real from the mvhd box (v0 and v1)") {
    // timescale 600, duration 1500 → 2500 ms
    val m0 = Multimodal.mp4Meta(mp4Bytes(600, 1500)).get
    assert(m0.timescale === 600L && m0.durationMs === 2500L)
    val m1 = Multimodal.mp4Meta(mp4Bytes(90000, 45000, v1 = true)).get
    assert(m1.durationMs === 500L)
    // tkhd presentation dims (16.16 fixed) surface when a track is present
    val md = Multimodal.mp4Meta(mp4Bytes(600, 1500, dims = Some((1920, 1080)))).get
    assert(md.width === 1920 && md.height === 1080 && md.durationMs === 2500L)
    assert(m0.width === 0 && m0.height === 0) // no track → dims unknown
    // malformed: not ISO BMFF, truncated, zero timescale → None, never throw
    assert(Multimodal.mp4Meta("nothing like an mp4 file".getBytes).isEmpty)
    assert(Multimodal.mp4Meta(mp4Bytes(600, 1500).take(40)).isEmpty)
    assert(Multimodal.mp4Meta(mp4Bytes(0, 1500)).isEmpty)
    // fuzz: random corruption degrades to Option, never an exception
    val rnd = new scala.util.Random(20260813L)
    val valid = mp4Bytes(600, 1500)
    (1 to 300).foreach { i =>
      val bytes =
        if (i % 2 == 0) { val c = valid.clone()
          c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte; c }
        else valid.take(rnd.nextInt(valid.length))
      Multimodal.mp4Meta(bytes)
    }
  }

  test("decode() uses the real MP4 branch for video duration") {
    import spark.implicits._
    val media = Seq(
      ("v1", "video", mp4Bytes(1000, 7250), Map.empty[String, String]),
      ("v2", "video", Array.fill(400)(3.toByte), Map.empty[String, String])
    ).toDF("mediaId", "kind", "bytes", "meta")
    val out = Multimodal.decode(media).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("durationMs")).toMap
    assert(out("v1") === 7250L)
    assert(out("v2") >= 5000L) // stub fallback for non-BMFF bytes
  }

  test("decode() uses the real WAV branch for audio, stub only for non-WAV") {
    import spark.implicits._
    val media = Seq(
      ("wav1", "audio", wavBytes(2, 8000, 16, 16000), Map.empty[String, String]),
      ("mp3ish", "audio", "not-a-wav-container".getBytes, Map.empty[String, String])
    ).toDF("mediaId", "kind", "bytes", "meta")
    val out = Multimodal.decode(media).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("wav1").getAs[Int]("channels") === 2)
    assert(out("wav1").getAs[Long]("durationMs") === 500L)
    // the stub branch still yields a deterministic plausible duration
    assert(out("mp3ish").getAs[Long]("durationMs") >= 1000L)
  }
}

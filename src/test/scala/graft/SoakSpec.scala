package graft

import graft.core.CollectionManager
import graft.functions.{HashingEmbedder, TextSplitter}
import graft.streaming.StreamingUpdate
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Sustained-load soak: every mutation and maintenance subsystem the engine
  * ships — bucketed layout, dedup-on-arrival gating, BM25 LSM deltas with
  * auto-folds, IVF incremental refresh + tombstone compaction + drift
  * retrain, interleaved out-of-band deletes, signature tombstones and
  * growth-triggered sig folds — composed over 8 REAL streaming ticks, then
  * judged by the strongest equality there is: the incrementally-maintained
  * collection must be indistinguishable from a collection built FROM SCRATCH
  * on the same final corpus. Any drift any subsystem bakes in across ticks
  * (double-counted postings, stale stats deltas, leaked tombstones, missed
  * bucket rewrites) surfaces as a chunks/search mismatch here.
  */
class SoakSpec extends AnyFunSuite with SparkSuite {

  test("8-tick streaming soak on a bucketed collection equals a from-scratch build") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val tmp = Files.createTempDirectory("graft-soak").toString
    val cm = new CollectionManager(spark, s"$tmp/coll",
      new HashingEmbedder(dim = 16), new TextSplitter(50, 10))
    val budget = 4096L // bytes — small enough that folds fire during the soak

    val stream = MemoryStream[(String, String, String)]
    val docsDf = stream.toDF().toDF("id", "url", "text")
      .withColumn("metadata", map(lit("source"), lit("stream")))
      .select("id", "url", "metadata", "text")

    // driver-side ground truth of what the collection SHOULD hold
    val truth = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def tick(rows: (String, String)*): Unit = {
      stream.addData(rows.map { case (id, text) => (id, s"u://$id", text) }: _*)
      val q = StreamingUpdate.collectionUpdateWriter(
        docsDf, cm, "soak", s"$tmp/ckpt",
        dedupOnArrival = true, compactTailBytes = budget,
        retrainIvfDriftAbove = 0.4, createBuckets = 8).start()
      q.awaitTermination(120000)
      assert(cm.readManifest("soak").numberOfDocuments === truth.size,
        s"manifest doc count after tick with ${rows.map(_._1)}")
    }
    def put(id: String, text: String): (String, String) = { truth(id) = text; (id, text) }

    // t1 — born bucketed from the stream
    tick(
      put("a1", "alpha primer on spark shuffle hash exchanges and partitions"),
      put("a2", "beta walkthrough of vector quantization residual codebooks"),
      put("a3", "gamma field notes about lucene style postings compression"),
      put("a4", "delta survey of watermark semantics in stream processing"))
    assert(cm.readManifest("soak").bucketCount === 8)
    cm.buildIvfIndex("soak", nLists = 2, nProbe = 2)
    // the positional artifact rides the whole soak from here: every later
    // tick appends its deltas, deletes tombstone it, folds fold it — the
    // end-state phrase results must equal a fresh build's (asserted below)
    cm.buildPhraseIndex("soak")

    // t2 — growth + a replacement (IVF now refreshes incrementally per tick)
    tick(
      put("b1", "epsilon catalog of broadcast join planning heuristics"),
      put("b2", "zeta handbook for salting skewed aggregation keys"),
      put("a2", "beta rewritten to cover product quantization ablations"))

    // t3 — an EXACT duplicate of a1's text under a new id must be gated out
    tick(
      put("c1", "eta checklist for parquet footer statistics pruning"),
      put("c2", "theta notes on adaptive query execution coalescing"),
      ("nd1", truth("a1"))) // near-dup arrival: same shingles, same bands
    assert(cm.documents("soak").filter(col("id") === "nd1").count() === 0,
      "dedup-on-arrival must drop the duplicate")

    // out-of-band delete between ticks — the removal half composes with the
    // watcher (sig tombstones must not block later re-ingestion)
    cm.delete("soak", Seq("a3")); truth.remove("a3")
    assert(cm.readManifest("soak").numberOfDocuments === truth.size)

    // t4 — more growth + replacement
    tick(
      put("d1", "iota comparison of lsm compaction scheduling budgets"),
      put("b1", "epsilon revised with runtime filter pushdown results"))

    // t5 — a SINGLE replacement: untouched buckets stay byte-identical
    def stamps(root: String): Map[String, (Long, Long)] = {
      val base = java.nio.file.Paths.get(root)
      val out = scala.collection.mutable.Map.empty[String, (Long, Long)]
      java.nio.file.Files.walk(base).forEach { p =>
        val f = p.toFile
        if (f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
          out(base.relativize(p).toString) = (f.length, f.lastModified)
      }
      out.toMap
    }
    val beforeDocs = stamps(s"$tmp/coll/soak/documents")
    val beforeChunks = stamps(s"$tmp/coll/soak/chunks")
    tick(put("c1", "eta checklist regrown around row group skipping proofs"))
    def touched(before: Map[String, (Long, Long)], root: String): Set[String] =
      (before.keySet ++ stamps(root).keySet)
        .filter(rel => before.get(rel) != stamps(root).get(rel))
        .map(_.split("/").head)
    assert(touched(beforeDocs, s"$tmp/coll/soak/documents").size <= 1)
    assert(touched(beforeChunks, s"$tmp/coll/soak/chunks").size <= 1)

    cm.delete("soak", Seq("b2")); truth.remove("b2")

    // t6 — resurrect the deleted a3 id with fresh text (its tombstoned
    // signature must not gate it) + growth
    tick(
      put("a3", "gamma reborn as a study of positional delta trees"),
      put("e1", "kappa digest of columnar execution vector sizes"))

    // t7, t8 — steady churn
    tick(
      put("f1", "lambda taxonomy of approximate nearest neighbor probes"),
      put("f2", "mu ledger of checkpoint recovery invariants"),
      put("d1", "iota updated with tombstone amortization measurements"))
    tick(put("g1", "nu appendix on range partition sampling overheads"))

    // ---- maintenance bounds after sustained churn
    assert(cm.bm25TailBytes("soak") <= budget,
      "the per-tick fold keeps the LSM tail under its budget")
    val report = cm.fsck("soak").collect()
    assert(report.forall(_.getAs[Boolean]("ok")), s"fsck:\n${report.mkString("\n")}")

    // ---- the equality gate: a from-scratch build of the SAME final corpus
    val finalCorpus = truth.toSeq.map { case (id, text) =>
      (id, s"u://$id", Map("source" -> "stream"), text)
    }.toDF("id", "url", "metadata", "text")
    cm.create("ref", finalCorpus, nBuckets = 8)

    def canon(name: String) = cm.chunks(name)
      .select("documentId", "chunkNumber", "indexedData")
      .collect().map(_.toString).sorted.toSeq
    assert(canon("soak") === canon("ref"),
      "incrementally-maintained chunks must equal a fresh build")
    assert(cm.readManifest("soak").numberOfChunks === cm.readManifest("ref").numberOfChunks)

    def docsFor(name: String, q: String, idx: Option[Seq[String]]) =
      cm.search(name, q, indexNames = idx).collect().map(_.getString(0)).toSeq
    for (q <- Seq("spark shuffle partitions", "product quantization",
                  "tombstone amortization", "positional delta trees")) {
      assert(docsFor("soak", q, Some(Seq("bm25"))) === docsFor("ref", q, Some(Seq("bm25"))),
        s"bm25 ranking diverged for '$q'")
      assert(docsFor("soak", q, None) === docsFor("ref", q, None),
        s"hybrid RRF ranking diverged for '$q'")
      // the IVF view (refreshed + compacted across the soak; the retrain
      // trigger itself is ASSERTED in StreamingSpec's drift-retrain e2e) is
      // EXACT at nProbe == nLists: it must agree with the flat scan over the
      // same collection, chunk ids and all
      assert(docsFor("soak", q, Some(Seq("vector_ivf"))) ===
             docsFor("soak", q, Some(Seq("vector_exact_l2"))),
        s"IVF view diverged from the flat truth for '$q'")
    }

    // deleted ids stayed dead; the resurrected id serves its NEW text
    assert(cm.documents("soak").filter(col("id") === "b2").count() === 0)
    val reborn = cm.search("soak", "positional delta trees",
      indexNames = Some(Seq("bm25"))).collect().map(_.getString(0))
    assert(reborn.contains("a3"))

    // the positional artifact, maintained incrementally across every tick,
    // delete and fold since t1, answers phrases exactly like a fresh build
    cm.buildPhraseIndex("ref")
    def phrases(name: String, ws: String*) = cm.phraseSearch(name, ws)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(phrases("soak", "delta", "trees") === phrases("ref", "delta", "trees"))
    assert(phrases("soak", "delta", "trees").map(_._1) === Seq("a3")) // via t6's resurrection
    // a phrase only the DELETED b2 carried must be dead on both sides
    assert(phrases("soak", "salting", "skewed").isEmpty)
    assert(phrases("ref", "salting", "skewed").isEmpty)
  }
}

package graft

import graft.core.{CollectionManager, WriterLock}
import graft.functions.{HashingEmbedder, TextSplitter}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions.{lit, map}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.nio.charset.StandardCharsets

/** Single-writer discipline, enforced (it was an assumption through round
  * 10): mutations take a lease-based lock, a second writer queues then fails
  * with a clear error, a crashed writer's expired lease is broken, racing
  * writers serialize (observable as a gapless manifest-version history), and
  * nested mutators (reindex → buildIvfIndex) reenter instead of deadlocking.
  */
class WriterLockSpec extends AnyFunSuite with SparkSuite {

  private def mkManager(tmp: String) = new CollectionManager(
    spark, tmp, new HashingEmbedder(dim = 16), new TextSplitter(50, 10))

  private def rawDocs(rows: Seq[(String, String, Map[String, String], String)]) = {
    import spark.implicits._
    rows.toDF("id", "url", "metadata", "text")
  }

  private val docs = Seq(
    ("d1", "u1", Map("lastModifiedAt" -> "2026-01-01T00:00:00"), "alpha beta gamma delta"),
    ("d2", "u2", Map("lastModifiedAt" -> "2026-01-02T00:00:00"), "epsilon zeta eta theta"))

  private def fs: FileSystem =
    FileSystem.get(spark.sparkContext.hadoopConfiguration)

  private def writeLockFile(path: Path, holder: String, acquiredAtMs: Long,
                            leaseMs: Long): Unit = {
    val json = s"""{"holder":"$holder","acquiredAtMs":$acquiredAtMs,"leaseMs":$leaseMs}"""
    val out = fs.create(path, true)
    try out.write(json.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  test("manifest version increments per mutation: create, update, delete") {
    val tmp = Files.createTempDirectory("graft-lock").toString
    val cm = mkManager(tmp)
    val m0 = cm.create("c", rawDocs(docs))
    assert(m0.version === 1L)
    val m1 = cm.update("c", rawDocs(Seq(
      ("d1", "u1", Map("lastModifiedAt" -> "2026-01-03T00:00:00"), "alpha beta revised"))))
    assert(m1.version === 2L)
    val m2 = cm.delete("c", Seq("d2"))
    assert(m2.version === 3L)
    assert(cm.readManifest("c").version === 3L)
    // the lock is released after each mutation — no residue file
    assert(!fs.exists(new Path(s"$tmp/c/_writer.lock")))
  }

  test("a held lock makes a second writer fail cleanly after waitMs") {
    val tmp = Files.createTempDirectory("graft-lock").toString
    val cm = mkManager(tmp)
    cm.create("c", rawDocs(docs))
    // simulate a LIVE foreign writer: fresh unexpired lease held by someone else
    val lock = new Path(s"$tmp/c/_writer.lock")
    writeLockFile(lock, "other-writer", System.currentTimeMillis(), 60000L)
    spark.conf.set("graft.writer.waitMs", "300")
    try {
      val e = intercept[WriterLock.WriterLockTimeout] {
        cm.delete("c", Seq("d1"))
      }
      assert(e.getMessage.contains("other-writer"))
      // the foreign lock is untouched and the collection unmodified
      assert(fs.exists(lock))
      assert(cm.readManifest("c").version === 1L)
      assert(cm.documents("c").count() === 2L)
    } finally spark.conf.unset("graft.writer.waitMs")
  }

  test("an EXPIRED lease (crashed writer) is broken and the mutation proceeds") {
    val tmp = Files.createTempDirectory("graft-lock").toString
    val cm = mkManager(tmp)
    cm.create("c", rawDocs(docs))
    val lock = new Path(s"$tmp/c/_writer.lock")
    // lease expired 10 s ago
    writeLockFile(lock, "dead-writer", System.currentTimeMillis() - 70000L, 60000L)
    val m = cm.delete("c", Seq("d2"))
    assert(m.version === 2L)
    assert(cm.documents("c").count() === 1L)
    assert(!fs.exists(lock)) // broken, taken, released
  }

  test("fsck flags an expired lock as residue; an unexpired one is not flagged") {
    val tmp = Files.createTempDirectory("graft-lock").toString
    val cm = mkManager(tmp)
    cm.create("c", rawDocs(docs))
    def lockRow() = cm.fsck("c").filter("check = 'expired_writer_lock'")
      .select("ok").head().getBoolean(0)
    assert(lockRow() === true) // no lock at all
    val lock = new Path(s"$tmp/c/_writer.lock")
    writeLockFile(lock, "live", System.currentTimeMillis(), 600000L)
    assert(lockRow() === true) // live writer, not residue
    writeLockFile(lock, "dead", System.currentTimeMillis() - 70000L, 60000L)
    assert(lockRow() === false) // crashed-writer residue
    fs.delete(lock, false)
  }

  test("a zombie release (same writerId, lease overrun) cannot delete a re-taken lock") {
    // Two threads of ONE manager share a writerId: if thread A overruns its
    // lease, a breaker re-acquires under the SAME writerId (thread B), and
    // A's late release() must NOT delete B's live lock — the stamp is
    // per-acquisition, not per-writer.
    val tmp = Files.createTempDirectory("graft-lock").toString
    val path = new Path(s"$tmp/_writer.lock")
    val a = new WriterLock(fs, path, "mgr", leaseMs = 60000L, waitMs = 1000L)
    a.acquire()
    // a breaker observes A expired (simulate: delete) and B re-acquires
    fs.delete(path, false)
    val b = new WriterLock(fs, path, "mgr", leaseMs = 60000L, waitMs = 1000L)
    b.acquire()
    a.release() // zombie: must be a no-op
    assert(fs.exists(path), "zombie release deleted the re-taken lock")
    b.release() // the live holder's release still works
    assert(!fs.exists(path))
  }

  test("racing writers serialize: N concurrent updates land as N versions") {
    val tmp = Files.createTempDirectory("graft-lock").toString
    val cm = mkManager(tmp)
    cm.create("c", rawDocs(docs))
    spark.conf.set("graft.writer.waitMs", "60000") // queue, don't fail
    try {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val n = 4
      val futures = (1 to n).map { i =>
        Future {
          // each writer is its own manager = its own holder id, like two
          // independent driver processes pointed at the same collection dir
          mkManager(tmp).update("c", rawDocs(Seq(
            (s"w$i", s"u$i", Map("lastModifiedAt" -> s"2026-02-0${i}T00:00:00"),
              s"writer $i payload content"))))
        }
      }
      Await.result(Future.sequence(futures), 120.seconds)
      val m = cm.readManifest("c")
      assert(m.version === (1L + n)) // gapless: every update serialized
      assert(m.numberOfDocuments === (2L + n)) // no lost update
      assert(cm.documents("c").count() === (2L + n))
      // serialized swaps leave a consistent table ↔ index pair
      assert(cm.fsck("c").filter("check like 'manifest%' and not ok").count() === 0L)
    } finally spark.conf.unset("graft.writer.waitMs")
  }

  test("CLI compact on a collection table dir takes the collection's writer lock") {
    val tmp = Files.createTempDirectory("graft-lock").toString
    val cm = mkManager(tmp)
    cm.create("c", rawDocs(docs))
    val lock = new Path(s"$tmp/c/_writer.lock")
    // a LIVE foreign writer: compact must refuse rather than interleave
    writeLockFile(lock, "other-writer", System.currentTimeMillis(), 60000L)
    spark.conf.set("graft.writer.waitMs", "300")
    val e = try intercept[WriterLock.WriterLockTimeout] {
      graft.api.Cli.run(Array("compact", "--path", s"$tmp/c/documents",
        "--target-mb", "64"), spark)
    } finally spark.conf.unset("graft.writer.waitMs")
    assert(e.getMessage.contains("other-writer"))
    fs.delete(lock, false)
    // lock gone → compact proceeds and releases (no residue)
    graft.api.Cli.run(Array("compact", "--path", s"$tmp/c/documents",
      "--target-mb", "64"), spark)
    assert(!fs.exists(lock))
    assert(cm.documents("c").count() === 2L)
  }

  test("streaming ticks racing an out-of-band deleter serialize to a consistent collection") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val tmp = Files.createTempDirectory("graft-lock-race").toString
    val cm = mkManager(s"$tmp/coll")
    // seed: one keeper + four delete targets; every racing operation touches
    // DISJOINT ids, so any serialization order converges to the same state —
    // what the test pins is that the lock yields SOME serialization (no
    // interleaved staged swaps, no lost index updates), audited by fsck
    cm.create("c", rawDocs(Seq(
      ("a0", "u0", Map("lastModifiedAt" -> "2026-01-01T00:00:00"), "keeper document zero")) ++
      (1 to 4).map(i => (s"b$i", s"ub$i",
        Map("lastModifiedAt" -> "2026-01-01T00:00:00"), s"victim document number $i"))))
    spark.conf.set("graft.writer.waitMs", "120000") // queue, never conflict-fail
    try {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val deleter = Future {
        val cmD = mkManager(s"$tmp/coll") // its own holder id, like a second process
        (1 to 4).foreach(i => cmD.delete("c", Seq(s"b$i")))
      }
      val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String, String)]
      val docs = stream.toDF().toDF("id", "url", "text")
        .withColumn("metadata", map(lit("lastModifiedAt"), lit("2026-02-01T00:00:00")))
        .select("id", "url", "metadata", "text")
      (1 to 4).foreach { i =>
        stream.addData((s"s$i", s"us$i", s"streamed document number $i arrives"))
        val q = graft.streaming.StreamingUpdate
          .collectionUpdateWriter(docs, cm, "c", s"$tmp/ckpt").start()
        q.awaitTermination(120000)
      }
      Await.result(deleter, 120.seconds)
      val ids = cm.documents("c").select("id").collect().map(_.getString(0)).toSet
      assert(ids === Set("a0", "s1", "s2", "s3", "s4"))
      // serialized history: create + 4 stream updates + 4 deletes, no lost
      // mutation (ticks may split into extra batches, hence >=)
      assert(cm.readManifest("c").version >= 9L)
      val badRows = cm.fsck("c").filter("not ok").collect()
      assert(badRows.isEmpty, badRows.mkString(", "))
      // BM25 consistent with the survivors: victims gone, stream content live
      val hits = cm.search("c", "streamed document", indexNames = Some(Seq("bm25")))
        .collect().map(_.getString(0))
      assert(hits.nonEmpty && hits.forall(_.startsWith("s")))
      assert(cm.search("c", "victim", indexNames = Some(Seq("bm25"))).isEmpty)
    } finally spark.conf.unset("graft.writer.waitMs")
  }

  test("nested mutators reenter the lock instead of deadlocking") {
    val tmp = Files.createTempDirectory("graft-lock").toString
    val cm = mkManager(tmp)
    cm.create("c", rawDocs(docs))
    cm.buildIvfIndex("c", nLists = 2, deterministic = true)
    spark.conf.set("graft.writer.waitMs", "2000") // a deadlock would throw fast
    try {
      cm.reindex("c") // reindex → buildIvfIndex, both locked
      cm.retrainIvf("c") // retrainIvf → buildIvfIndex
      // an explicit outer transaction over several mutators also composes
      cm.withWriterLock("c") {
        cm.delete("c", Seq("d2"))
        cm.compactBm25("c")
      }
      assert(cm.documents("c").count() === 1L)
    } finally spark.conf.unset("graft.writer.waitMs")
  }
}

package graft

import graft.core.{CollectionManager, WriterLock}
import graft.functions.{HashingEmbedder, TextSplitter}
import org.apache.hadoop.fs.{FileSystem, Path}
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

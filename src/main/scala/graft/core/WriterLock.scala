package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}
import java.nio.charset.StandardCharsets

/** Lease-based single-writer lock over a collection directory.
  *
  * Every prior round ASSUMED single-writer discipline on the mutation path
  * (update/delete/index maintenance); this makes it enforced. The lock is a
  * `_writer.lock` file created with create-new semantics next to the
  * manifest; holders stamp `(holder, acquiredAtMs, leaseMs)` and delete it on
  * release. A second writer waits up to `waitMs`, then fails with a clear
  * error instead of silently interleaving staged swaps. A crashed holder's
  * lock is broken once its lease expires — liveness without a coordinator.
  *
  * Atomicity of the create-new primitive:
  *   - `file://` — `java.nio.file.Files.createFile` (O_CREAT|O_EXCL, atomic
  *     on POSIX). Hadoop's RawLocalFileSystem `create(overwrite=false)` is a
  *     check-then-create (TOCTOU), so nio is used directly.
  *   - `hdfs://` — `FileSystem.create(path, overwrite=false)` is atomic at
  *     the NameNode.
  *   - Object stores without atomic create-new (plain S3) need a conditional
  *     put or an external coordinator; this class is the right seam to plug
  *     one in, and the contract (exclusive create; delete to release) maps
  *     1:1 onto S3 `If-None-Match` conditional writes.
  *
  * Breaking a stale lease deletes the observed-expired file then retries the
  * exclusive create; two breakers may both delete, but the create arbitrates
  * — exactly one proceeds. A holder that outlives its lease may lose the
  * lock (the standard lease contract); size `leaseMs` to the slowest
  * expected mutation, or renew by re-acquiring per operation as
  * [[CollectionManager]] does.
  *
  * Reentrant per thread: nested `withLock` on the same lock path is a no-op
  * below the outermost frame, so `reindex` → `buildIvfIndex` composes.
  */
final class WriterLock(
    fs: FileSystem,
    lockPath: Path,
    holder: String,
    leaseMs: Long,
    waitMs: Long,
    pollMs: Long = 50L) {

  import WriterLock._

  // The stamped holder is unique PER ACQUISITION, not per writer: two
  // threads of one manager share a writerId, and if thread A overruns its
  // lease, thread B (same manager) may break it and re-acquire — a
  // holder-only stamp would let A's late release() delete B's live lock.
  // The human-readable writerId stays as the prefix for timeout messages.
  @volatile private var stamp: String = holder

  private def nowMs: Long = System.currentTimeMillis()

  private def isLocal: Boolean = {
    val s = lockPath.toUri.getScheme
    s == null || s == "file"
  }

  private def localFile: java.nio.file.Path = {
    // Path#toUri keeps the fs-relative path; resolve through the FileSystem
    // so a relative lockPath still lands where the manifest does.
    val qualified = fs.makeQualified(lockPath).toUri
    java.nio.file.Paths.get(qualified.getPath)
  }

  /** One exclusive-create attempt. True iff this call created the file. */
  private def tryCreate(payload: Array[Byte]): Boolean = {
    if (isLocal) {
      val p = localFile
      try {
        val parent = p.getParent
        if (parent != null) java.nio.file.Files.createDirectories(parent)
        java.nio.file.Files.write(p, payload,
          java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    } else {
      try {
        val out = fs.create(lockPath, false)
        try out.write(payload) finally out.close()
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case _: java.io.IOException if fs.exists(lockPath) => false
      }
    }
  }

  private def readState(): Option[LockState] =
    try {
      val in = fs.open(lockPath)
      val json = try new String(
        org.apache.commons.io.IOUtils.toByteArray(in), StandardCharsets.UTF_8)
      finally in.close()
      val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
      Some(LockState(
        holder = root.path("holder").asText(""),
        acquiredAtMs = root.path("acquiredAtMs").asLong(0L),
        leaseMs = root.path("leaseMs").asLong(0L)))
    } catch {
      case _: java.io.FileNotFoundException => None
      case _: java.io.IOException => None // racing delete/partial write: retry
    }

  private def payload(at: Long): Array[Byte] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("holder", stamp)
    root.put("acquiredAtMs", at)
    root.put("leaseMs", leaseMs)
    mapper.writeValueAsString(root).getBytes(StandardCharsets.UTF_8)
  }

  /** Acquire or throw [[WriterLockTimeout]] after `waitMs`. */
  def acquire(): Unit = {
    stamp = s"$holder#${java.util.UUID.randomUUID().toString.take(8)}"
    val deadline = nowMs + waitMs
    while (true) {
      if (tryCreate(payload(nowMs))) return
      readState() match {
        case Some(s) if s.acquiredAtMs + s.leaseMs <= nowMs =>
          // Expired lease: break it. The exclusive create on the next loop
          // iteration arbitrates between concurrent breakers.
          fs.delete(lockPath, false)
        case maybe =>
          if (nowMs >= deadline) {
            val who = maybe.map(s => s"'${s.holder}'").getOrElse("unknown")
            throw new WriterLockTimeout(
              s"writer lock at $lockPath held by $who after ${waitMs}ms; " +
              "a second writer must not interleave mutations — wait, or " +
              "break the lease if the holder crashed (it auto-expires " +
              s"after its leaseMs)")
          }
          Thread.sleep(pollMs)
      }
    }
  }

  /** Release if still ours (exact acquisition stamp — a broken-then-retaken
    * lock, even by the SAME writerId on another thread, is left alone).
    */
  def release(): Unit =
    readState() match {
      case Some(s) if s.holder == stamp => fs.delete(lockPath, false)
      case _ => ()
    }
}

object WriterLock {
  final case class LockState(holder: String, acquiredAtMs: Long, leaseMs: Long)

  final class WriterLockTimeout(msg: String) extends IllegalStateException(msg)

  // Reentrancy ledger: lock paths held by the current thread, with depth.
  private val held = new ThreadLocal[scala.collection.mutable.Map[String, Int]] {
    override def initialValue() = scala.collection.mutable.Map.empty[String, Int]
  }

  /** Run `body` holding the lock; reentrant within a thread. */
  def withLock[T](fs: FileSystem, lockPath: Path, holder: String,
                  leaseMs: Long, waitMs: Long)(body: => T): T = {
    val key = fs.makeQualified(lockPath).toString
    val ledger = held.get()
    val depth = ledger.getOrElse(key, 0)
    if (depth > 0) { // already ours on this thread
      ledger(key) = depth + 1
      try body finally ledger(key) = depth
    } else {
      val lock = new WriterLock(fs, lockPath, holder, leaseMs, waitMs)
      lock.acquire()
      ledger(key) = 1
      try body finally {
        ledger.remove(key)
        lock.release()
      }
    }
  }
}

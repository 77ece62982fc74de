package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Single-writer lease for the persisted stores ([[graft.dedup.LshIndex]],
  * [[graft.sim.VecIndex]], [[graft.text.TextIndex]], and the
  * [[Sources]] upsert/compaction slot). The exclusion contract those
  * stores document — "one writer at a time; readers need no
  * coordination" — is ENFORCED here instead of merely stated: a second
  * concurrent writer fails loudly at acquire time rather than silently
  * losing a read-modify-write (the TextIndex stats row) or interleaving
  * version allocation (Sources.upsert vs compact).
  *
  * Mechanism: an exclusive `_LEASE` file at the store root
  * (underscore-prefixed → invisible to every parquet reader), created with
  * `FileSystem.create(overwrite = false)` — atomic on HDFS and local
  * filesystems; on S3-shaped stores this degrades to best-effort, which is
  * the industry norm for file-based locks (Delta's S3 single-writer story
  * is the same caveat). The file body records holder + expiry epoch-millis.
  *
  * Crashed-holder recovery: a holder that dies leaks its lease file, so
  * every lease carries a TTL. An acquirer that finds an EXPIRED lease
  * breaks it (delete + one re-create attempt); a live one refuses. The
  * break has a documented benign race — two breakers can both delete, but
  * only one wins the subsequent exclusive create; the loser refuses. The
  * TTL must exceed the longest legitimate write (default 10 min here;
  * a cluster deployment sizes it to its batch cadence).
  */
object Lease {

  /** Thrown on a refused acquire — the loud single-writer violation. */
  final class HeldException(msg: String) extends IllegalStateException(msg)

  val DefaultTtlMs: Long = 10 * 60 * 1000L

  /** Safety margin before the TTL deadline past which [[Handle.stillHeld]]
    * reports false: a commit started inside the margin could still be
    * in flight when a breaker legitimately acts at the deadline, so the
    * holder must stop committing this long BEFORE expiry. Sized to
    * dominate one manifest-version write (a small single-task Spark
    * job), not the 10-minute TTL. */
  private val ExpiryMarginMs: Long = 30 * 1000L

  /** Live proof of lease ownership — what a holder consults immediately
    * before an irreversible commit. `stillHeld` is true only while (a)
    * the TTL deadline is comfortably ahead ([[ExpiryMarginMs]] — past it
    * a breaker may already be acting) AND (b) the lease file still
    * carries this acquisition's NONCE (a broken-and-reacquired lease has
    * someone else's). A holder that observes false must ABORT, not
    * retry: the takeover protocol assumes an expired holder stops
    * writing (the r11 advisor's double-rollforward window). */
  final class Handle private[Lease] (fs: org.apache.hadoop.fs.FileSystem,
      p: Path, nonce: String, deadline: Long) {
    def stillHeld(): Boolean =
      System.currentTimeMillis() + ExpiryMarginMs < deadline &&
        readInfo(fs, p).exists(_._3.contains(nonce))
  }

  private def leasePath(root: String) = new Path(root, "_LEASE")

  /** Run `body` holding the store's writer lease; release on every exit
    * path. Refuses with [[HeldException]] if another holder's unexpired
    * lease is present. */
  def withLease[T](s: SparkSession, root: String, holder: String,
      ttlMs: Long = DefaultTtlMs)(body: => T): T =
    withLeaseHandle(s, root, holder, ttlMs)(_ => body)

  /** [[withLease]] exposing the acquisition's [[Handle]] so the body can
    * re-verify ownership right before a commit it must never double. */
  def withLeaseHandle[T](s: SparkSession, root: String, holder: String,
      ttlMs: Long = DefaultTtlMs)(body: Handle => T): T = {
    val p = leasePath(root)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    fs.mkdirs(p.getParent)
    val nonce = java.util.UUID.randomUUID().toString
    var deadline = tryCreate(fs, p, holder, ttlMs, nonce)
    if (deadline.isEmpty) {
      // existing lease: break it only if expired, then ONE more attempt.
      // An UNREADABLE lease (readInfo None) is NOT proof of expiry: the
      // holder's create+write+close is not atomic, so a hot concurrent
      // acquirer can read the file in the empty window between create
      // and write — breaking there would seat two holders (found by the
      // r15 OCC commit turnstile, whose contention loop hammers this
      // path). Only a READ past-deadline breaks immediately; a torn read
      // breaks only once the FILE ITSELF has sat unreadable past the
      // TTL (a holder that crashed between create and write).
      val info = readInfo(fs, p)
      val now = System.currentTimeMillis()
      val expired = info match {
        case Some((_, d, _)) => now > d
        case None =>
          try now - fs.getFileStatus(p).getModificationTime > ttlMs
          catch { case _: java.io.IOException => true } // vanished: retry
      }
      if (!expired)
        throw new HeldException(
          s"$root is locked by writer '${info.map(_._1).getOrElse("?")}' " +
            s"until ${new java.util.Date(info.map(_._2).getOrElse(0L))} — " +
            "the store allows ONE writer; run appends/compactions " +
            "sequentially (e.g. from the same foreachBatch loop)")
      fs.delete(p, false)
      deadline = tryCreate(fs, p, holder, ttlMs, nonce)
      if (deadline.isEmpty)
        throw new HeldException(
          s"$root: lost the lease race while breaking an expired lease — " +
            "another writer acquired it; retry later")
    }
    try body(new Handle(fs, p, nonce, deadline.get))
    finally {
      // release ONLY our own acquisition: a holder whose expired lease
      // was broken and re-acquired must not delete the new holder's file
      // (that would let a THIRD writer in while the second still runs).
      // The nonce check alone is read-then-delete, not atomic — if our
      // lease EXPIRED during body, a breaker could delete+reacquire in
      // that window and we would delete the successor's file. So delete
      // only while the deadline is still comfortably ahead (the
      // stillHeld margin): inside that window no breaker may legally
      // act, so the read-delete pair cannot interleave with one. An
      // expired lease is simply LEFT for the next acquirer's break path
      // (it is already past-deadline, so the break is immediate).
      // Residual window: a filesystem whose delete itself stalls past
      // the margin — on stores where that matters, size ExpiryMarginMs
      // to the store's worst-case metadata-op latency. The margin scales
      // down with short TTLs (min(margin, ttl/2)): a fixed 30 s margin
      // would mean a 20 s-TTL lease is NEVER deleted on release and every
      // back-to-back writer waits out the full TTL — a short-TTL caller
      // is implicitly accepting proportionally tighter latency budgets.
      val releaseMargin = math.min(ExpiryMarginMs, ttlMs / 2)
      if (System.currentTimeMillis() + releaseMargin < deadline.get &&
          readInfo(fs, p).exists(_._3.contains(nonce)))
        fs.delete(p, false)
    }
  }

  private def tryCreate(fs: org.apache.hadoop.fs.FileSystem, p: Path,
      holder: String, ttlMs: Long, nonce: String): Option[Long] =
    locally {
      // the one CAS primitive ([[StoreMaint.createExclusive]]): Hadoop's
      // LOCAL create(overwrite=false) is exists-then-create — a TOCTOU
      // window that seated TWO lease holders under the r15 commit
      // turnstile's contention (the second's truncating create erased
      // the first's nonce: stillHeld read false on a fresh lease)
      val deadline = System.currentTimeMillis() + ttlMs
      if (StoreMaint.createExclusive(fs, p,
          s"$holder|$deadline|$nonce".getBytes("UTF-8")))
        Some(deadline)
      else None
    }

  private def readInfo(fs: org.apache.hadoop.fs.FileSystem,
      p: Path): Option[(String, Long, Option[String])] =
    try {
      val in = fs.open(p)
      val bytes = try org.apache.commons.io.IOUtils.toByteArray(in)
      finally in.close()
      new String(bytes, "UTF-8").split('|') match {
        case Array(h, d, n) => Some((h, d.toLong, Some(n)))
        case Array(h, d) => Some((h, d.toLong, None)) // pre-r12 lease file
        case _ => None
      }
    } catch { case _: Exception => None } // torn/vanished: see break path
}

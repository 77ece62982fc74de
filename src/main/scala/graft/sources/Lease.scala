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

  private def leasePath(root: String) = new Path(root, "_LEASE")

  /** Run `body` holding the store's writer lease; release on every exit
    * path. Refuses with [[HeldException]] if another holder's unexpired
    * lease is present. */
  def withLease[T](s: SparkSession, root: String, holder: String,
      ttlMs: Long = DefaultTtlMs)(body: => T): T = {
    val p = leasePath(root)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    fs.mkdirs(p.getParent)
    if (!tryCreate(fs, p, holder, ttlMs)) {
      // existing lease: break it only if expired, then ONE more attempt
      val info = readInfo(fs, p)
      val now = System.currentTimeMillis()
      val expired = info.forall { case (_, deadline) => now > deadline }
      if (!expired)
        throw new HeldException(
          s"$root is locked by writer '${info.map(_._1).getOrElse("?")}' " +
            s"until ${new java.util.Date(info.map(_._2).getOrElse(0L))} — " +
            "the store allows ONE writer; run appends/compactions " +
            "sequentially (e.g. from the same foreachBatch loop)")
      fs.delete(p, false)
      if (!tryCreate(fs, p, holder, ttlMs))
        throw new HeldException(
          s"$root: lost the lease race while breaking an expired lease — " +
            "another writer acquired it; retry later")
    }
    try body
    finally fs.delete(p, false)
  }

  private def tryCreate(fs: org.apache.hadoop.fs.FileSystem, p: Path,
      holder: String, ttlMs: Long): Boolean =
    try {
      val out = fs.create(p, false) // overwrite=false: atomic exclusive
      out.write(s"$holder|${System.currentTimeMillis() + ttlMs}"
        .getBytes("UTF-8"))
      out.close()
      true
    } catch { case _: java.io.IOException => false }

  private def readInfo(fs: org.apache.hadoop.fs.FileSystem,
      p: Path): Option[(String, Long)] =
    try {
      val in = fs.open(p)
      val bytes = try org.apache.commons.io.IOUtils.toByteArray(in)
      finally in.close()
      new String(bytes, "UTF-8").split('|') match {
        case Array(h, d) => Some((h, d.toLong))
        case _ => None
      }
    } catch { case _: Exception => None } // torn/vanished: treat as expired
}

package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared lifecycle plumbing for the persisted-index family
  * ([[graft.dedup.LshIndex]], [[graft.sim.VecIndex]],
  * [[graft.text.TextIndex]]): the partition-layout pin that makes the
  * partitioning knobs real deployment parameters, and the in-place
  * partition-dir compaction whose reader-safety token is the stores'
  * duplicate-tolerant reads.
  */
object StoreMaint {

  // ---- layout pin ----------------------------------------------------------

  /** Partitioning knobs of a store, pinned at build time. `pfxLen` = hex
    * chars of the content-hash partition key (16 dirs per char); `docPfxMod`
    * = modulus of the id-keyed partition key. Both "grow with the cluster":
    * a 1000-executor deployment builds with pfxLen 2-3 / mod 256-4096 so
    * dir count matches write parallelism and per-dir file sizes stay
    * healthy. The pin makes the knob a CONTRACT like VecIndex's persisted
    * quantizer: appends and lookups read the layout the store was built
    * with instead of trusting compile-time constants to agree. */
  final case class Layout(pfxLen: Int, docPfxMod: Long)

  private def layoutPath(root: String) = new Path(root, "_layout.json")

  private[graft] def fsFor(s: SparkSession, p: Path): FileSystem =
    p.getFileSystem(s.sessionState.newHadoopConf())

  /** Pin `l` at the store root — temp + atomic rename, written once at
    * build time (single-writer slot). */
  def writeLayout(s: SparkSession, root: String, l: Layout): Unit = {
    val p = layoutPath(root)
    val fs = fsFor(s, p)
    fs.mkdirs(p.getParent)
    val tmp = new Path(root, s"._layout.json.tmp")
    val out = fs.create(tmp, true)
    out.write(s"""{"pfxLen":${l.pfxLen},"docPfxMod":${l.docPfxMod}}"""
      .getBytes("UTF-8"))
    out.close()
    fs.delete(p, false)
    fs.rename(tmp, p)
  }

  /** Read the pinned layout; `default` for stores predating the pin. */
  def readLayout(s: SparkSession, root: String, default: Layout): Layout = {
    val p = layoutPath(root)
    val fs = fsFor(s, p)
    if (!fs.exists(p)) return default
    val in = fs.open(p)
    val txt = try new String(
      org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
    finally in.close()
    def field(k: String): String =
      txt.split(s""""$k":""")(1).takeWhile(c => c.isDigit || c == '-')
    Layout(field("pfxLen").toInt, field("docPfxMod").toLong)
  }

  // ---- tombstones ----------------------------------------------------------

  /** Append tombstone rows `(idCol, src, tpfx = id mod `mod`)` for a
    * delete tagged `src`. Append-mode and therefore replay-duplicating —
    * every consumer deduplicates by id, the same tolerance contract as the
    * data rows. Partitioned by id-mod for bounded file counts and
    * compaction parallelism. */
  private[graft] def writeTombstones(ids: DataFrame, dir: String,
      idCol: String, src: String, mod: Long): Unit =
    ids.select(col(idCol)).distinct()
      .select(col(idCol), lit(src).as("src"),
        pmod(col(idCol), lit(mod)).as("tpfx"))
      .repartition(col("tpfx"))
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .partitionBy("tpfx").parquet(dir)

  // ---- in-place partition-dir compaction -----------------------------------

  /** Compact every `part=value` dir of `table` to one file of canonical
    * rows (`canon` = the store's read-time dedup + tombstone purge),
    * WITHOUT a version manifest: new files are renamed in first, old files
    * deleted after. A concurrent reader therefore sees old-only, old+new,
    * or new-only — and because every read of these stores already
    * deduplicates by the row's functional key (the crash-replay tolerance
    * recipe), the old+new overlap is semantically invisible. The stores'
    * duplicate tolerance IS the concurrency token; no reader coordination.
    *
    * A dir whose rows are all purged (fully tombstoned) is removed once
    * its old files are gone — `readPruned`'s exists-filter then skips it.
    *
    * Driver work is O(partition dirs) FS calls (the same bound as the
    * stores' pruned-read path collection); the data pass is ONE Spark job
    * over the table, repartitioned on the partition column so each live
    * dir receives exactly one compacted file. */
  def compactPartitioned(s: SparkSession, table: String, partCol: String,
      canon: DataFrame => DataFrame): Unit = {
    val root = new Path(table)
    val fs = fsFor(s, root)
    if (!fs.exists(root)) return
    def dataFiles(d: Path): Seq[Path] =
      fs.listStatus(d).filter(st => st.isFile &&
          !st.getPath.getName.startsWith("_") &&
          !st.getPath.getName.startsWith("."))
        .map(_.getPath).toSeq
    val dirs = fs.listStatus(root)
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith(partCol + "="))
      .map(_.getPath).toSeq
    if (dirs.isEmpty) return
    // snapshot the pre-compaction file set: these—and only these—are
    // deleted after the swap (the lease guarantees nothing lands between)
    val oldFiles: Map[String, Seq[Path]] =
      dirs.map(d => d.getName -> dataFiles(d)).toMap
    val tmp = new Path(root.getParent, "." + root.getName + "-compact-tmp")
    fs.delete(tmp, true)
    canon(s.read.option("basePath", table).parquet(dirs.map(_.toString): _*))
      .repartition(col(partCol))
      .write.partitionBy(partCol).parquet(tmp.toString)
    for (d <- fs.listStatus(tmp)
         if d.isDirectory && d.getPath.getName.startsWith(partCol + "=")) {
      val live = new Path(root, d.getPath.getName)
      fs.mkdirs(live)
      dataFiles(d.getPath).foreach { f =>
        // "compacted-" + the part-file's uuid name: unique vs live files
        fs.rename(f, new Path(live, "compacted-" + f.getName))
      }
    }
    oldFiles.foreach { case (_, files) => files.foreach(fs.delete(_, false)) }
    // drop dirs left with no data files (fully-tombstoned partitions)
    dirs.foreach { d =>
      if (fs.exists(d) && dataFiles(d).isEmpty) fs.delete(d, true)
    }
    fs.delete(tmp, true)
  }
}

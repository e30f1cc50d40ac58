package graft.store

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.SparkSession

/** Project-store → central-root sync (reference sync_cmd.py:23-152):
  * lays a project's tables under
  * `dest/hostname=H/namespace=N/project=P/...`, the exact layout
  * [[MultiProjectStore]] scans. The reference's default mode is a
  * SYMLINK and its hard mode exits "not yet implemented"
  * (sync_cmd.py:155-167); symlinks are meaningless on distributed
  * storage, so this is the incremental copy the reference stubs:
  *
  *  - a file already present at the target with the SAME LENGTH is
  *    skipped (store part files are written once and never mutated —
  *    appends create new files — so length identity is sufficient);
  *  - differing-length or missing files are (re)copied;
  *  - nothing at the target is ever deleted (a sync must not be able
  *    to destroy the central archive).
  *
  * Incremental by construction at scale: the store's `date=` layout
  * means a daily sync's listing only DIFFERS in new date partitions,
  * and the copy loop is embarrassingly parallel over files (DistCp
  * shape) — the sequential driver loop here is the correctness
  * reference; swap in a parallel copier when a single store outgrows
  * it. Storage-agnostic via the Hadoop FileSystem API.
  */
object SyncStore {

  final case class SyncResult(copied: Long, skipped: Long, bytes: Long)

  def targetPath(destRoot: String, hostname: String, namespace: String,
      project: String): String =
    s"$destRoot/hostname=$hostname/namespace=$namespace/project=$project"

  /** Sync every file under `srcRoot` into the central root. */
  def sync(spark: SparkSession, srcRoot: String, destRoot: String,
      hostname: String, namespace: String, project: String): SyncResult = {
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new Path(srcRoot)
    val srcFs = src.getFileSystem(conf)
    val destBase = new Path(targetPath(destRoot, hostname, namespace, project))
    val destFs = destBase.getFileSystem(conf)
    if (!srcFs.exists(src)) return SyncResult(0, 0, 0)
    var copied = 0L; var skipped = 0L; var bytes = 0L
    val it = srcFs.listFiles(src, true)
    val srcUri = srcFs.makeQualified(src).toUri
    while (it.hasNext) {
      val f = it.next()
      val rel = srcUri.relativize(f.getPath.toUri).getPath
      val target = new Path(destBase, rel)
      // Length alone can't catch a same-length divergent copy; when the
      // filesystem exposes checksums (HDFS does, local/raw FS returns
      // null) compare those too. A null on either side degrades to the
      // length check, and so does an ALGORITHM mismatch: HDFS embeds
      // bytes-per-CRC/block-size in the algorithm name, so byte-identical
      // files on differently-configured filesystems checksum unequal
      // forever — treating that as divergence would recopy the whole
      // store on every sync (the reason DistCp skips checksum compare
      // across block sizes). Only a same-algorithm mismatch is proof
      // of divergence.
      val upToDate = destFs.exists(target) && {
        val st = destFs.getFileStatus(target)
        st.getLen == f.getLen && {
          val (cs, ct) = (srcFs.getFileChecksum(f.getPath),
            destFs.getFileChecksum(target))
          cs == null || ct == null ||
            cs.getAlgorithmName != ct.getAlgorithmName || cs.equals(ct)
        }
      }
      if (upToDate) skipped += 1
      else {
        destFs.mkdirs(target.getParent)
        FileUtil.copy(srcFs, f.getPath, destFs, target,
          false /* deleteSource */, true /* overwrite */, conf)
        copied += 1
        bytes += f.getLen
      }
    }
    SyncResult(copied, skipped, bytes)
  }
}

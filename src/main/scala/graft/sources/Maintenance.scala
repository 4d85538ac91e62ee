package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Table-maintenance jobs — the OPTIMIZE half of the layout story
  * (q44_zorder_layout audits the clustering half).
  *
  * A long-lived dataset accretes small files: streaming micro-batch
  * sinks, partitioned appends, and per-task writers all cut files far
  * below the efficient scan size, and at 100 TB the file COUNT (driver
  * listing, per-file open cost, scheduler pressure) becomes the
  * bottleneck before the bytes do. Compaction rewrites a directory
  * into size-targeted files without changing a row.
  */
object Maintenance {

  final case class CompactStats(
      filesBefore: Long, filesAfter: Long,
      bytesBefore: Long, rows: Long)

  /** Flat-directory contract: the snapshot/re-list quiesce guard and
    * the census only see top-level files, but `spark.read.parquet(dir)`
    * would also read nested partition subdirectories — a writer landing
    * in a subdirectory would be invisible to the guard and silently
    * replaced by the staged rewrite. So the unit of compaction is one
    * LEAF directory (at 100 TB the scheduler walks the partition tree
    * and calls this per leaf); anything else fails loudly here.
    */
  private def parquetFiles(fs: org.apache.hadoop.fs.FileSystem,
      path: org.apache.hadoop.fs.Path): Array[org.apache.hadoop.fs.FileStatus] = {
    val all = fs.listStatus(path)
    val subdirs = all.filter(st => st.isDirectory &&
      !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith("."))
    require(subdirs.isEmpty,
      s"$path has nested directories (${subdirs.map(_.getPath.getName).mkString(", ")}) — " +
        "compaction/census operate on one leaf directory at a time")
    all.filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
  }

  /** Compact a parquet directory into ⌈bytes / targetFileBytes⌉
    * size-balanced files (minimum 1). Content-preserving BY
    * CONSTRUCTION — one read, one repartition, one write, no row-level
    * logic — and spec-asserted (same rows, same content multiset,
    * fewer files).
    *
    * The swap is a two-rename staging swap, NOT atomic (same
    * last-writer-wins contract as the bucketed-table staging swap in
    * EventStreams): a crash between the renames strands the data in
    * `<dir>_precompact`, and the NEXT call restores it before doing
    * anything else, so the job is re-runnable after any crash. The
    * directory must be QUIESCED during compaction — this is a plain
    * parquet directory, not a transaction-logged table — and the
    * guard re-lists the directory right before the swap, aborting
    * loudly if a concurrent writer added or removed files since the
    * snapshot (the alternative is silently deleting the concurrent
    * append with the pre-compaction files).
    *
    * The repartition is a round-robin shuffle of the full data — the
    * price of balanced output files. Pass `sortBy` for the
    * layout-preserving variant: `repartitionByRange(sortCol)` +
    * `sortWithinPartitions(sortCol)` keeps per-FILE key ranges
    * disjoint AND rows inside each file ordered, so row-group/page
    * min-max pruning stays effective after compaction (the z-order
    * case sorts by the Morton value, composing with q44's
    * expression). At 100 TB compaction runs per-partition-directory,
    * not whole-table, and this function IS that per-directory unit.
    */
  def compactParquet(spark: SparkSession, dir: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      sortBy: Option[String] = None): CompactStats = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new org.apache.hadoop.fs.Path(dir.stripSuffix("/") + "_compacting")
    val old = new org.apache.hadoop.fs.Path(dir.stripSuffix("/") + "_precompact")
    // crash restore: a previous attempt that died between its two
    // renames left the live directory missing and the data staged out —
    // promote it back before compacting anything
    if (!fs.exists(path) && fs.exists(old))
      require(fs.rename(old, path), s"could not restore $old after a crashed compaction")
    fs.delete(staging, true)
    val snapshot = parquetFiles(fs, path)
    val bytesBefore = snapshot.map(_.getLen).sum
    val filesBefore = snapshot.length.toLong
    val nOut = math.max(1L, (bytesBefore + targetFileBytes - 1) / targetFileBytes).toInt
    val df = spark.read.parquet(dir)
    val repartitioned = sortBy match {
      case Some(c) => df.repartitionByRange(nOut, col(c)).sortWithinPartitions(col(c))
      case None    => df.repartition(nOut)
    }
    repartitioned.write.mode("overwrite").parquet(staging.toString)
    // quiesce guard: abort (keeping the live directory untouched) if a
    // concurrent writer changed the file set since the snapshot — the
    // staged rewrite would silently drop their rows otherwise
    val now = parquetFiles(fs, path).map(st => (st.getPath.getName, st.getLen)).toSet
    val was = snapshot.map(st => (st.getPath.getName, st.getLen)).toSet
    if (now != was) {
      fs.delete(staging, true)
      sys.error(s"$dir changed during compaction (concurrent writer?) — aborted, nothing replaced")
    }
    fs.delete(old, true)
    require(fs.rename(path, old), s"could not stage out $dir")
    require(fs.rename(staging, path), s"could not swap in compacted $dir")
    fs.delete(old, true)
    // count AFTER the swap: the compacted few-file directory is the
    // cheap side to scan; counting the 100k-small-file side first would
    // double exactly the per-file open cost compaction exists to remove
    val rows = spark.read.parquet(dir).count()
    val filesAfter = parquetFiles(fs, path).length.toLong
    CompactStats(filesBefore, filesAfter, bytesBefore, rows)
  }

  /** File census for a parquet directory — the signal a maintenance
    * scheduler watches to decide when compaction pays. Pure filesystem
    * metadata (O(files) listing, no data read, zero-row files
    * included): (file count, total bytes, smallest file's bytes).
    */
  def fileCensus(spark: SparkSession, dir: String): (Long, Long, Long) = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = parquetFiles(fs, path)
    (files.length.toLong, files.map(_.getLen).sum,
      if (files.isEmpty) 0L else files.map(_.getLen).min)
  }
}

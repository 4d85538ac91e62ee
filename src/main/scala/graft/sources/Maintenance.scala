package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, input_file_name}

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

  /** Compact a parquet directory into ⌈bytes / targetFileBytes⌉
    * size-balanced files (minimum 1), atomically: write to a staging
    * sibling, then swap directories. Content-preserving BY CONSTRUCTION
    * — one read, one repartition, one write, no row-level logic — and
    * spec-asserted (same rows, same content multiset, fewer files).
    *
    * The repartition is a round-robin shuffle of the full data — the
    * price of balanced output files. A sort-preserving variant would
    * `repartitionByRange(sortCol)` to keep row-group pruning effective
    * after compaction; pass `sortBy` for that (the z-order case sorts
    * by the Morton value, composing with q44's expression). At 100 TB
    * compaction runs per-partition-directory, not whole-table, and this
    * function IS that per-directory unit.
    */
  def compactParquet(spark: SparkSession, dir: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      sortBy: Option[String] = None): CompactStats = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(path)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    val bytesBefore = parts.map(_.getLen).sum
    val filesBefore = parts.length.toLong
    val nOut = math.max(1L, (bytesBefore + targetFileBytes - 1) / targetFileBytes).toInt
    val df = spark.read.parquet(dir)
    val rows = df.count()
    val repartitioned = sortBy match {
      case Some(c) => df.repartitionByRange(nOut, col(c))
      case None    => df.repartition(nOut)
    }
    val staging = new org.apache.hadoop.fs.Path(dir.stripSuffix("/") + "_compacting")
    repartitioned.write.mode("overwrite").parquet(staging.toString)
    // swap: the reader-visible directory flips in two renames — the
    // same last-writer-wins contract as the bucketed-table staging swap
    val old = new org.apache.hadoop.fs.Path(dir.stripSuffix("/") + "_precompact")
    fs.delete(old, true)
    require(fs.rename(path, old), s"could not stage out $dir")
    require(fs.rename(staging, path), s"could not swap in compacted $dir")
    fs.delete(old, true)
    val filesAfter = fs.listStatus(path)
      .count(st => st.isFile && st.getPath.getName.endsWith(".parquet")).toLong
    CompactStats(filesBefore, filesAfter, bytesBefore, rows)
  }

  /** File-count census for a parquet directory — the signal a
    * maintenance scheduler watches to decide when compaction pays.
    */
  def fileCensus(spark: SparkSession, dir: String): (Long, Long) = {
    val stats = spark.read.parquet(dir)
      .groupBy(input_file_name()).count().collect()
    (stats.length.toLong, stats.map(_.getLong(1)).sum)
  }
}

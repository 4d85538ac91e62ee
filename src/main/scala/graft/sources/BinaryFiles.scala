package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, regexp_extract}

/** The one committed-corpus front door: binaryFile scan (the
  * distributed object-store listing at 100 TB — many small files is
  * the pathological-listing shape this scan handles) + the
  * file-name / dated-dir projection every decoder needs. Shared by
  * the statement, PDF, XLSX, image and audio sources so a change to
  * the glob/recursion/date-extraction logic lands once.
  */
object BinaryFiles {

  /** (path, content, file_name, batch_date) for every file matching
    * glob under dirs; batch_date is "" when the file is not under a
    * YYYYMMDD dir. Decode happens downstream, per partition — nothing
    * is per-file on the driver.
    */
  def scan(s: SparkSession, glob: String, dirs: String*): DataFrame =
    projectPaths(
      s.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(dirs: _*))

  /** The path → (file_name, batch_date) projection, factored out so
    * the batch scan above and the STREAMING sources
    * (EventStreams.statementStream / statementPipeline) share one
    * definition — a change to the date-extraction logic must land in
    * every reader of the dated-folder layout at once, or stream and
    * batch silently diverge on the same files.
    */
  def projectPaths(raw: DataFrame): DataFrame =
    raw.select(col("path"), col("content"),
      regexp_extract(col("path"), "([^/]+)$", 1).as("file_name"),
      regexp_extract(col("path"), "([0-9]{8})/[^/]+$", 1).as("batch_date"))
}

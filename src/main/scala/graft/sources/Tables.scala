package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the harness tables.
  *
  * One parquet file per table under the scale-factor dir. Readers are
  * plain `spark.read.parquet` so Catalyst keeps full pushdown/pruning
  * freedom — no eager caching, no schema forcing (the files carry
  * their schema).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** events.parquet carries TIMESTAMP(NANOS), which Spark's vectorized
    * parquet reader rejects. Read nanos as long and truncate to
    * microsecond timestamps — the same truncation DuckDB applies when
    * casting TIMESTAMP_NS to TIMESTAMP, so oracle comparisons agree.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** CSV reader with explicit schema — general source support; the
    * reference ingests CSV/Excel exports (README.md "Batch
    * Processing" → unified CSV). Excel itself is out of scope (no
    * such jar in the pinned env); CSV is the interchange format.
    */
  def csv(spark: SparkSession, path: String, ddl: String): DataFrame =
    spark.read.schema(ddl).option("header", "true").csv(path)

  /** JSON-lines reader with explicit schema (product_codes.json-style
    * side inputs in the reference).
    */
  def json(spark: SparkSession, path: String, ddl: String): DataFrame =
    spark.read.schema(ddl).json(path)

  /** ORC reader — second columnar format with full predicate pushdown
    * and column pruning, for interop with ORC-based warehouses.
    */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}

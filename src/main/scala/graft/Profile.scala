package graft

import org.apache.spark.sql.functions._

/** Scratch profiling main (dev-only). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    spark.range(1).count()
    val docs = sources.Tables.documents(spark, d)
    time("docs.count")(docs.count())
    val norm = docs.withColumn("norm", lower(regexp_replace(trim(col("text")), "\\s+", " ")))
      .withColumn("toks", split(col("norm"), " "))
    time("norm+toks")(norm.select(sum(size(col("toks")))).count())
    val shing = norm.withColumn("shingles", expr(
      """CASE WHEN size(toks) < 3 THEN array(norm)
        | ELSE transform(sequence(0, size(toks)-3),
        |                i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])) END""".stripMargin))
    time("shingles")(shing.select(sum(size(col("shingles")))).count())
    val hashed = shing.withColumn("sh_hashes", expr("array_distinct(transform(shingles, x -> xxhash64(x)))"))
    time("sh_hashes")(hashed.select(sum(size(col("sh_hashes")))).count())
    val blocked = hashed
      .withColumn("blk1", expr("array_min(sh_hashes)"))
      .withColumn("blk2", expr(
        "array_min(transform(sh_hashes, h -> pmod(pmod(h, 2147483647) * 1103 + 12345, 2147483647)))"))
      .withColumn("n_sh", size(col("sh_hashes")))
      .select(col("doc_id"), col("blk1"), col("blk2"), col("n_sh"), col("sh_hashes"))
    time("blocked")(blocked.count())
    time("blocked force-eval")(blocked.select(sum(element_at(col("sh_hashes"), 1)) + sum(col("blk1")) + sum(col("blk2"))).count())
    val joined = blocked.as("a").join(blocked.as("b"),
      col("a.blk1") === col("b.blk1") && col("a.blk2") === col("b.blk2") &&
        col("a.doc_id") < col("b.doc_id"))
    time("join only")(joined.count())
    val bchk = blocked.localCheckpoint()
    val joined2 = bchk.as("a").join(bchk.as("b"),
      col("a.blk1") === col("b.blk1") && col("a.blk2") === col("b.blk2") &&
        col("a.doc_id") < col("b.doc_id"))
    time("join after checkpoint")(joined2.count())
    time("full dd_ngram")(operators.Dedup.ddNgramJaccard(spark, d).count())
    spark.stop()
  }
}

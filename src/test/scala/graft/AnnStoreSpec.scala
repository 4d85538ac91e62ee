package graft

import org.apache.spark.sql.functions._

/** Lifecycle of the persisted IVF assignment store
  * ([[graft.operators.Similarity.assignedStore]], round 15 — the ANN
  * side of the corpus-artifact machinery): build-on-first-use with the
  * fingerprint sidecar keyed on embeddings.parquet, fresh-session
  * re-registration without a data rewrite, output parity with the
  * direct assignment recompute, and rebuild on a corpus change.
  */
class AnnStoreSpec extends SparkTestBase {

  /** Deterministic little corpus: 40 vectors, dim 8, 3 labels. The
    * vectors vary enough that centroid lists are non-trivial.
    */
  private def vecs(seed: Int): Seq[(Long, Seq[Float], Int)] =
    (0 until 40).map { i =>
      val v = (0 until 8).map(j =>
        math.sin(seed + i * 8 + j).toFloat)
      (i.toLong, v, i % 3)
    }

  private def writeEmbeddings(dir: String, seed: Int): Unit = {
    import spark.implicits._
    vecs(seed).toDF("vec_id", "embedding", "label").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  private def listing(name: String): Seq[(String, Long, Long)] = {
    val path = operators.Dedup.bandStorePath(spark, name)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(path).filter(_.isFile)
      .map(st => (st.getPath.getName, st.getLen, st.getModificationTime))
      .toSeq.sortBy(_._1)
  }

  private def outOf(d: String): Seq[(Long, Long, Long, Double)] =
    SparkEntry.queries("ann_incremental")(spark, d).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("sim"))).toSeq

  test("ann assignment store: builds once, fresh session reuses files, rebuilds on corpus change") {
    val dir = java.nio.file.Files.createTempDirectory("graft-annstore-spec").toString
    writeEmbeddings(dir, seed = 1)
    val name = operators.Similarity.annAssignStoreName(dir)
    try {
      val out1 = outOf(dir)
      assert(out1.nonEmpty, "incremental probe should return neighbors")
      val l1 = listing(name)
      assert(l1.exists(_._1 == "_SOURCE_FINGERPRINT"),
        "store missing its fingerprint sidecar")
      // fresh-session path: catalog entry gone, files reused untouched
      spark.sql(s"DROP TABLE IF EXISTS $name")
      assert(outOf(dir) == out1)
      assert(listing(name) == l1,
        "re-registration rewrote store files — the warm path recomputed the assignment")
      // parity: the stored assignment equals the direct recompute
      val direct = sources.Tables.embeddings(spark, dir)
        .select(col("vec_id"), operators.Similarity.nearestCentroidCol(
          col("embedding"), operators.Similarity.fixedCentroids(spark, dir))
          .as("cent_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val stored = operators.Similarity.assignedStore(spark, dir)
        .select(col("vec_id"), col("cent_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(stored == direct, "stored assignment diverges from direct recompute")
      // a rewritten corpus changes the fingerprint and rebuilds
      writeEmbeddings(dir, seed = 2)
      val stored2 = operators.Similarity.assignedStore(spark, dir)
        .select(col("vec_id"), col("cent_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val direct2 = sources.Tables.embeddings(spark, dir)
        .select(col("vec_id"), operators.Similarity.nearestCentroidCol(
          col("embedding"), operators.Similarity.fixedCentroids(spark, dir))
          .as("cent_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(stored2 == direct2,
        "store served a stale assignment after a corpus rewrite")
    } finally operators.Dedup.invalidateBandStore(spark, dir)
  }

  test("ann_incremental and ann_range_search read the store, never recompute the assignment") {
    // the plan property the store exists for: no per-row centroid
    // argmax over the stored side — the signature of a recompute is
    // the 16-cosine literal array in the stored side's projection;
    // after the store lands, the only argmax left is the probe side's
    // (a bounded query set). The store table name in the scan pins the
    // read path.
    Seq("ann_incremental", "ann_range_search").foreach { op =>
      val df = SparkEntry.queries(op)(spark, sfDir)
      df.queryExecution.toRdd.count()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("graft_dd_annivf_store"),
        s"$op does not scan the persisted assignment store:\n${plan.take(2000)}")
    }
  }
}

package graft

import org.apache.spark.sql.functions._

/** Lifecycle of the persisted band-bucketed signature store
  * ([[graft.operators.Dedup.bandedStore]], the round-13 flagship):
  * build-on-first-use with a marker-last fingerprint sidecar,
  * fresh-session re-registration WITHOUT a data rewrite, rebuild on a
  * corpus change, pair-graph equivalence with the direct recompute,
  * and explicit invalidation.
  */
class DedupStoreSpec extends SparkTestBase {

  private def writeCorpus(dir: String, docs: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  /** (file name, length, mtime) of the store's data files — the probe
    * for "reused without rewrite" vs "rebuilt".
    */
  private def storeListing(dir: String): Seq[(String, Long, Long)] = {
    val name = operators.Dedup.bandStoreName(dir)
    val path = operators.Dedup.bandStorePath(spark, name)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(path).filter(_.isFile)
      .map(st => (st.getPath.getName, st.getLen, st.getModificationTime))
      .toSeq.sortBy(_._1)
  }

  private val corpusA = Seq(
    1L -> "aa bb cc dd ee ff gg hh ii jj",
    2L -> "aa bb cc dd ee ff gg hh ii jj",
    3L -> "zz yy xx ww vv uu tt ss rr qq")

  test("band store: builds once with a fingerprint sidecar, fresh session reuses files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-store-spec").toString
    writeCorpus(dir, corpusA)
    val name = operators.Dedup.bandStoreName(dir)
    try {
      val pairs1 = operators.Dedup.minhashPairs(spark, dir)
        .select(col("doc_a"), col("doc_b")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val listing1 = storeListing(dir)
      assert(listing1.exists(_._1 == "_SOURCE_FINGERPRINT"),
        "store missing its marker-last fingerprint sidecar")
      assert(listing1.exists(_._1.startsWith("part-")), "store has no data files")

      // fresh-session path: the catalog entry is gone (new JVM), the
      // files are not — re-registration must NOT rewrite any data file
      spark.sql(s"DROP TABLE IF EXISTS $name")
      val pairs2 = operators.Dedup.minhashPairs(spark, dir)
        .select(col("doc_a"), col("doc_b")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(storeListing(dir) == listing1,
        "re-registration rewrote store files — the warm path recomputed")
      assert(pairs2 == pairs1)

      // equivalence: the store-fed pair graph IS the direct recompute's
      import spark.implicits._
      val direct = operators.Dedup
        .minhashPairsOf(corpusA.toDF("doc_id", "text"))
        .select(col("doc_a"), col("doc_b")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs1 == direct,
        "store-fed pairs diverge from the direct full recompute")
      assert(pairs1.contains((1L, 2L)), "the planted near-dup pair is missing")
    } finally operators.Dedup.invalidateBandStore(spark, dir)
  }

  test("band store: a rewritten corpus changes the fingerprint and rebuilds") {
    val dir = java.nio.file.Files.createTempDirectory("graft-store-spec").toString
    writeCorpus(dir, corpusA)
    try {
      val before = operators.Dedup.minhashPairs(spark, dir).count()
      assert(before >= 1)
      // rewrite: 2 is no longer 1's duplicate, 3 gains one
      writeCorpus(dir, Seq(
        1L -> "aa bb cc dd ee ff gg hh ii jj",
        2L -> "mm nn oo pp qq rr ss tt uu vv",
        3L -> "zz yy xx ww vv uu tt ss rr qq",
        4L -> "zz yy xx ww vv uu tt ss rr qq"))
      val after = operators.Dedup.minhashPairs(spark, dir)
        .select(col("doc_a"), col("doc_b")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(after.contains((3L, 4L)),
        "store served stale signatures after a corpus rewrite")
      assert(!after.contains((1L, 2L)),
        "stale pair survived the rebuild — fingerprint check is dead")
    } finally operators.Dedup.invalidateBandStore(spark, dir)
  }

  test("band store: invalidation drops both the table and the files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-store-spec").toString
    writeCorpus(dir, corpusA)
    val name = operators.Dedup.bandStoreName(dir)
    operators.Dedup.bandedStore(spark, dir).count()
    operators.Dedup.invalidateBandStore(spark, dir)
    assert(!spark.catalog.tableExists(name))
    val path = operators.Dedup.bandStorePath(spark, name)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(path), "invalidation left store files behind")
  }

  test("pair restriction commutes with emission (dd_pipeline's survivor stage)") {
    // signatures are per-doc, so the store-backed full-corpus pair
    // stream semi-joined to a subset's endpoints must equal a direct
    // recompute over that subset — the property dd_pipeline's pair
    // stage rests on since round 13
    import org.apache.spark.sql.functions.pmod
    val docs = sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val survivors = docs.filter(pmod(col("doc_id"), org.apache.spark.sql.functions.lit(3)) === 0)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_a"), col("doc_b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = pairSet(operators.Dedup.minhashPairsOf(survivors))
    val restricted = pairSet(operators.Dedup.minhashPairs(spark, sfDir)
      .join(survivors.select(col("doc_id").as("doc_a")), Seq("doc_a"), "left_semi")
      .join(survivors.select(col("doc_id").as("doc_b")), Seq("doc_b"), "left_semi"))
    assert(restricted == direct,
      s"missing=${(direct -- restricted).take(3)} extra=${(restricted -- direct).take(3)}")
    assert(direct.nonEmpty, "subset should still carry near-dup pairs")
  }

  test("simhash chunk store: builds once, fresh session reuses files, output matches direct recompute") {
    val dir = java.nio.file.Files.createTempDirectory("graft-store-spec").toString
    // corpusA plus one NULL-text document: simhashSigTableOf gives it a
    // NULL signature, and the operator's contract (simhashGroups drops
    // NULL signatures) says it must emit NO pairs — previously the
    // contract was coded for but never exercised by any corpus
    writeCorpus(dir, corpusA :+ (9L -> null.asInstanceOf[String]))
    val name = operators.Dedup.simhashStoreName(dir)
    try {
      def pairSet() = operators.Dedup.ddSimhash(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val pairs1 = pairSet()
      val path = operators.Dedup.bandStorePath(spark, name)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      def listing() = fs.listStatus(path).filter(_.isFile)
        .map(st => (st.getPath.getName, st.getLen, st.getModificationTime)).toSeq.sortBy(_._1)
      val l1 = listing()
      assert(l1.exists(_._1 == "_SOURCE_FINGERPRINT"))
      // fresh-session path: catalog entry gone, files reused
      spark.sql(s"DROP TABLE IF EXISTS $name")
      assert(pairSet() == pairs1)
      assert(listing() == l1, "re-registration rewrote simhash store files")
      // direct recompute over the same corpus: brute-force hamming <= 4
      // over the NON-NULL signatures (the operator's documented domain)
      import spark.implicits._
      val sigRows = operators.Dedup
        .simhashSigTableOf((corpusA :+ (9L -> null.asInstanceOf[String]))
          .toDF("doc_id", "text"))
        .collect()
      assert(sigRows.exists(r => r.getLong(0) == 9L && r.isNullAt(1)),
        "NULL-text doc should carry a NULL signature")
      val sigs = sigRows.filter(!_.isNullAt(1))
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      val brute = (for {
        (ida, ha) <- sigs.iterator
        (idb, hb) <- sigs.iterator if ida < idb
        h = java.lang.Long.bitCount(ha ^ hb) if h <= 4
      } yield (ida, idb, h.toLong)).toSet
      assert(pairs1 == brute, s"store-fed simhash pairs diverge from brute force: $pairs1 vs $brute")
      assert(pairs1.exists(p => p._1 == 1L && p._2 == 2L), "planted identical pair missing")
      assert(!pairs1.exists(p => p._1 == 9L || p._2 == 9L),
        "NULL-signature doc must emit no pairs (simhashGroups contract)")
    } finally operators.Dedup.invalidateBandStore(spark, dir)
  }

  test("shingle store: fresh session reuses files, arrays match direct recompute") {
    val dir = java.nio.file.Files.createTempDirectory("graft-store-spec").toString
    writeCorpus(dir, corpusA)
    val name = operators.Dedup.shingleStoreName(dir)
    try {
      def shingleMap() = operators.Dedup.shingled(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
      val m1 = shingleMap()
      spark.sql(s"DROP TABLE IF EXISTS $name")
      assert(shingleMap() == m1, "fresh-session shingle store read diverged")
      import spark.implicits._
      val direct = operators.Dedup.shingledOf(corpusA.toDF("doc_id", "text"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
      assert(m1 == direct, "stored shingle arrays diverge from direct recompute")
    } finally operators.Dedup.invalidateBandStore(spark, dir)
  }

  test("simhash store: pair generation reads the store, never recomputes signatures") {
    // the plan property the store exists for — no SimHash64 kernel
    // anywhere in the executed pair plan. Both legs derive from the
    // localCheckpoint'd groups frame, so the pair plan starts at an
    // ExistingRDD and the store scan is pinned on the SIGNATURE frame
    // instead: together, kernel-absence in the pair plan + store-scan
    // in the only signature source prove pairs come from stored
    // signatures. Leg 2's distinct-value shuffle (corpus /
    // clique-factor rows) is BY DESIGN; leg 1 adds no shuffle at all
    // (map-side expansion over the groups rows).
    val sigsPlan = operators.Dedup.simhashStore(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(sigsPlan.contains("graft_dd_simsig_store"),
      s"expected the signature frame to scan the simhash store:\n$sigsPlan")
    val pairs = operators.Dedup.ddSimhash(spark, sfDir)
    pairs.queryExecution.toRdd.count()
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("SimHash64"),
      s"pair generation still recomputes simhash signatures instead of reading the store:\n$plan")
  }

  test("band store: both sides of the pair join scan the bucketed table") {
    // the scale property the store exists for: the band self-join reads
    // two co-bucketed scans (Bucketed: true), never a recomputed
    // shingle/MinHash subtree — and at real sizes needs no exchange.
    // At the spec's toy SF the store fits under the broadcast
    // threshold and AQE rightly broadcasts (bucketing moot) — disable
    // broadcast here to expose and pin the AT-SCALE plan shape.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val pairs = operators.Dedup.minhashPairs(spark, sfDir)
      pairs.queryExecution.toRdd.count()
      val plan = pairs.queryExecution.executedPlan.toString
      val bucketedScans = "Bucketed: true".r.findAllIn(plan).size
      assert(bucketedScans >= 2,
        s"expected two bucketed store scans under the band join, plan:\n$plan")
      assert(!plan.contains("MinHashSignature"),
        "pair generation still recomputes signatures instead of reading the store")
      assert(!plan.contains("Exchange"),
        s"co-bucketed band self-join should need no exchange, plan:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}

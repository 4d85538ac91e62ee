package graft

import org.apache.spark.sql.functions._
import graft.functions.HashFunctions._

/** Native codegen'd signature kernels vs the interpreted HOF chains
  * they replaced — must be bit-for-bit identical (every downstream LSH
  * bucket depends on it).
  */
class HashExprsSpec extends SparkTestBase {

  private def docs = sources.Tables.documents(spark, sfDir)

  test("minhashSig matches the transform/array_min HOF chain") {
    val sh = docs
      .withColumn("norm", lower(regexp_replace(trim(col("text")), "\\s+", " ")))
      .withColumn("toks", split(col("norm"), " "))
      .withColumn("shingles", expr(
        """CASE WHEN size(toks) < 3 THEN array(norm)
          | ELSE transform(sequence(0, size(toks)-3),
          |                i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])) END""".stripMargin))
      .withColumn("sh_hashes", expr("array_distinct(transform(shingles, x -> xxhash64(x)))"))
    val cmp = sh.select(
      minhashSig(col("sh_hashes"), 32).as("native"),
      expr("""transform(sequence(0, 31), p ->
               array_min(transform(sh_hashes, h ->
                 pmod(pmod(h, 2147483647) * cast(2*p+1 as bigint)
                      + cast(p as bigint) * 2654435761, 2147483647))))""").as("composed"))
    assert(cmp.filter(not(col("native") === col("composed"))).count() === 0)
  }

  test("simhash64 matches the aggregate/zip_with HOF chain") {
    val cmp = docs
      .withColumn("th", expr("transform(split(lower(trim(text)), ' '), t -> xxhash64(t))"))
      .withColumn("bitcounts", expr(
        """aggregate(th, array_repeat(cast(0 as bigint), 64),
          |  (acc, h) -> zip_with(acc, sequence(0, 63),
          |    (a, j) -> a + if((shiftright(h, j) & 1) = 1, 1, -1)))""".stripMargin))
      .select(
        simhash64(split(lower(trim(col("text"))), " ")).as("native"),
        expr("""aggregate(zip_with(bitcounts, sequence(0, 63),
                  (c, j) -> if(c > 0, shiftleft(cast(1 as bigint), j), cast(0 as bigint))),
                cast(0 as bigint), (acc, v) -> acc | v)""").as("composed"))
    assert(cmp.filter(col("native") =!= col("composed")).count() === 0)
  }

  test("shingleHashes matches the concat_ws/array_distinct HOF chain") {
    val cmp = docs
      .withColumn("norm", lower(regexp_replace(trim(col("text")), "\\s+", " ")))
      .withColumn("toks", split(col("norm"), " "))
      .withColumn("shingles", expr(
        """CASE WHEN size(toks) < 3 THEN array(norm)
          | ELSE transform(sequence(0, size(toks)-3),
          |                i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])) END""".stripMargin))
      .select(
        shingleHashes(col("toks"), 3).as("native"),
        expr("array_distinct(transform(shingles, x -> xxhash64(x)))").as("composed"))
    assert(cmp.filter(not(col("native") === col("composed"))).count() === 0)
  }

  test("shingleHashes degenerate cases: short docs hash the whole string") {
    import spark.implicits._
    val cmp = Seq("one two", "single", "a b c", "a b c d").toDF("t")
      .withColumn("toks", split(col("t"), " "))
      .select(col("t"), shingleHashes(col("toks"), 3).as("h"),
        expr("xxhash64(t)").as("whole"))
      .collect()
    cmp.filter(r => r.getString(0).split(" ").length < 3).foreach { r =>
      assert(r.getSeq[Long](1) == Seq(r.getLong(2)))
    }
    assert(cmp.find(_.getString(0) == "a b c d").get.getSeq[Long](1).length == 2)
  }

  test("expressions are registered as SQL functions via extensions") {
    docs.createOrReplaceTempView("hx_docs")
    val n = spark.sql(
      """SELECT graft_simhash64(split(lower(trim(text)), ' ')) AS sh,
        |       graft_minhash_sig(transform(split(text, ' '), x -> xxhash64(x)), 8) AS mh
        |FROM hx_docs""".stripMargin).count()
    assert(n > 0)
  }

  test("sigMatchCount matches the aggregate/zip_with HOF chain") {
    // exercise on every cross-doc signature pair of the corpus — the
    // exact rows pair emission feeds it
    val sig = docs
      .withColumn("norm", lower(regexp_replace(trim(col("text")), "\\s+", " ")))
      .withColumn("sig", minhashSig(shingleHashes(split(col("norm"), " "), 3), 32))
      .select(col("doc_id"), col("sig"))
    val cmp = sig.as("a").join(sig.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(
        sigMatchCount(col("a.sig"), col("b.sig")).as("native"),
        expr("aggregate(zip_with(a.sig, b.sig, (x, y) -> if(x = y, 1, 0)), 0, (acc, v) -> acc + v)")
          .as("composed"))
    assert(cmp.filter(col("native") =!= col("composed")).count() === 0)
    assert(cmp.filter(col("native") === 32).count() > 0,
      "corpus should contain at least one identical-signature pair")
  }

  test("firstCollidingBand matches the HOF band scan, 8 when no band collides") {
    val sig = docs
      .withColumn("norm", lower(regexp_replace(trim(col("text")), "\\s+", " ")))
      .withColumn("sig", minhashSig(shingleHashes(split(col("norm"), " "), 3), 32))
      .select(col("doc_id"), col("sig"))
    val cmp = sig.as("a").join(sig.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(
        firstCollidingBand(col("a.sig"), col("b.sig")).as("native"),
        expr("""coalesce(array_min(filter(sequence(0, 7), j ->
               |  a.sig[j*4]   = b.sig[j*4]   AND a.sig[j*4+1] = b.sig[j*4+1] AND
               |  a.sig[j*4+2] = b.sig[j*4+2] AND a.sig[j*4+3] = b.sig[j*4+3])), 8)""".stripMargin)
          .as("composed"))
    assert(cmp.filter(col("native") =!= col("composed")).count() === 0)
    // both emission-relevant regimes are present in the corpus
    assert(cmp.filter(col("native") === 0).count() > 0)
    assert(cmp.filter(col("native") === 8).count() > 0)
  }

  test("first-band-wins pair generation equals the canonical-collapse form") {
    // the refactor contract: minhashPairs' emit-once join must produce
    // EXACTLY the pair set (and estimates) of the groupBy collapse the
    // incremental paths still use
    val banded = operators.Dedup.bandedOf(
      operators.Dedup.minhashSigTableOf(docs.select(col("doc_id"), col("text"))))
    val collapsed = operators.Dedup.pairsFromCollisions(
      banded.as("a").join(banded.as("b"),
        col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val emitted = operators.Dedup.minhashPairs(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(emitted == collapsed,
      s"missing=${(collapsed -- emitted).take(3)} extra=${(emitted -- collapsed).take(3)}")
  }

  test("intersectCount equals size(array_intersect) on corpus shingles and adversarial arrays") {
    // corpus side: every candidate-ish pairing over real shingle arrays
    val sh = operators.Dedup.shingled(spark, sfDir)
      .select(col("doc_id"), col("sh_hashes"))
    val cmp = sh.as("a").join(sh.as("b"),
        col("a.doc_id") < col("b.doc_id") &&
          pmod(col("a.doc_id") + col("b.doc_id"), lit(7)) === 0)
      .select(
        intersectCount(col("a.sh_hashes"), col("b.sh_hashes")).as("native"),
        size(array_intersect(col("a.sh_hashes"), col("b.sh_hashes")))
          .cast("long").as("composed"),
        (size(col("a.sh_hashes")) + size(col("b.sh_hashes")) -
          intersectCount(col("a.sh_hashes"), col("b.sh_hashes")))
          .cast("long").as("union_native"),
        size(array_union(col("a.sh_hashes"), col("b.sh_hashes")))
          .cast("long").as("union_composed"))
    assert(cmp.count() > 0)
    assert(cmp.filter(col("native") =!= col("composed")).count() === 0)
    assert(cmp.filter(col("union_native") =!= col("union_composed")).count() === 0)
    // adversarial side: the reserved empty-slot sentinel (0L), empty
    // arrays, disjoint and identical arrays — driver-exact vs Scala sets
    val cases = Seq(
      (Array(0L, 1L, 2L), Array(0L, 3L)),
      (Array.empty[Long], Array(1L, 2L)),
      (Array(5L), Array.empty[Long]),
      (Array(1L, 2L, 3L), Array(4L, 5L)),
      (Array(-1L, Long.MinValue, 0L), Array(Long.MinValue, -1L, 7L)),
      (Array(9L, 8L, 7L), Array(7L, 8L, 9L)))
    import org.apache.spark.sql.catalyst.util.ArrayData
    cases.foreach { case (a, b) =>
      val got = functions.IntersectCount.compute(
        ArrayData.toArrayData(a), ArrayData.toArrayData(b))
      val want = a.toSet.intersect(b.toSet).size.toLong
      assert(got == want, s"${a.mkString(",")} ∩ ${b.mkString(",")}: got $got want $want")
    }
  }
}

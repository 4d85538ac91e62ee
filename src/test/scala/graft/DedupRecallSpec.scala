package graft

import org.apache.spark.sql.functions._

/** Recall of the LSH dedup family against exact ground truth computed
  * brute-force over the sf0.001 corpus (500 docs → 125k pairs, cheap
  * in-memory).
  */
class DedupRecallSpec extends SparkTestBase {

  private lazy val shingleSets: Map[Long, Set[String]] =
    sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), lower(trim(col("text"))).as("t"))
      .collect()
      .map { r =>
        val toks = r.getString(1).split(" ")
        val sh = if (toks.length < 3) Set(r.getString(1))
          else toks.sliding(3).map(_.mkString(" ")).toSet
        r.getLong(0) -> sh
      }.toMap

  private lazy val trueHighPairs: Set[(Long, Long)] = {
    val ids = shingleSets.keys.toSeq.sorted
    (for {
      i <- ids.iterator
      j <- ids.iterator if i < j
      a = shingleSets(i); b = shingleSets(j)
      inter = (a & b).size
      if inter > 0 && inter.toDouble / (a | b).size >= 0.9
    } yield (i, j)).toSet
  }

  test("minhash-LSH finds every pair with exact jaccard >= 0.9") {
    val found = operators.Dedup.ddMinhashLsh(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val missed = trueHighPairs -- found
    assert(trueHighPairs.nonEmpty, "corpus should contain planted near-dups")
    assert(missed.isEmpty, s"LSH missed ${missed.size}/${trueHighPairs.size}: ${missed.take(5)}")
  }

  test("simhash two-leg emission is pigeonhole-exact at the hamming<=4 verify") {
    // the round-14 recall contract: output == ALL pairs at hamming <= 4.
    // Identical signatures are an equality join (exact by definition);
    // cross-value pairs come from 15 C(6,2) two-chunk pair bands —
    // hamming <= 4 dirties at most 4 of the 6 chunks, leaving >= 1
    // clean pair band, so banding cannot miss the emitted threshold
    // (the r13 4x16 asymmetry, where hamming-4 pairs spread
    // one-per-chunk were unreachable, is closed)
    // NULL signatures (NULL-text docs) emit no pairs by the operator's
    // documented contract (simhashGroups filters them) — mirror that
    // filter here so the replay states the same domain instead of
    // crashing on getLong(1); the NULL path itself is pinned with a
    // planted NULL-text doc in DedupStoreSpec
    val sigs = sources.Tables.documents(spark, sfDir)
      .transform(operators.Dedup.simhashSigTableOf)
      .filter(col("simhash").isNotNull)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val brute = (for {
      (ida, ha) <- sigs.iterator
      (idb, hb) <- sigs.iterator if ida < idb
      h = java.lang.Long.bitCount(ha ^ hb) if h <= 4
    } yield (ida, idb, h.toLong)).toSet
    val found = operators.Dedup.ddSimhash(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(brute.nonEmpty, "corpus should contain simhash near-dups")
    assert(found == brute,
      s"missed=${(brute -- found).take(5)} extra=${(found -- brute).take(5)}")
  }

  test("ngram-jaccard blocking finds nearly all true pairs") {
    val found = operators.Dedup.ddNgramJaccard(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    // two-perm blocking has ~j^2 recall per pair (≈0.8 at j=0.9)
    val recall = (trueHighPairs & found).size.toDouble / trueHighPairs.size
    assert(recall >= 0.6, s"recall=$recall over ${trueHighPairs.size} true pairs")
    // and everything it reports really is >= 0.8 exact jaccard
    found.foreach { case (a, b) =>
      val (sa, sb) = (shingleSets(a), shingleSets(b))
      val j = (sa & sb).size.toDouble / (sa | sb).size
      assert(j >= 0.75, s"pair ($a,$b) reported but exact jaccard=$j")
    }
  }
}

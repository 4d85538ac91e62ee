package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{BpeTokenCount, CosineSimilarity, DotProduct, FirstCollidingBand, FirstMatchingChunk, IntersectCount, MinHashSignature, ShingleHashes, SigMatchCount, SimHash64, TokenModeCount, TopKValues}

/** SparkSessionExtensions entry point: registers the native vector
  * expressions as SQL functions so `spark.sql("... graft_cosine(a, b)
  * ...")` works anywhere the extension is installed
  * (`spark.sql.extensions=graft.GraftExtensions`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    ext.injectOptimizerRule(_ => graft.plans.TopKFilterPushdown)
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash_sig"),
      (children: Seq[Expression]) =>
        MinHashSignature(children(0), children(1).eval().asInstanceOf[Number].intValue)))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      (children: Seq[Expression]) => SimHash64(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKValues].getName, "graft_topk"),
      (children: Seq[Expression]) =>
        TopKValues(children(0), children(1),
          children(2).eval().asInstanceOf[Number].intValue)
          .toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("graft_token_count"),
      new ExpressionInfo(classOf[BpeTokenCount].getName, "graft_token_count"),
      (children: Seq[Expression]) => BpeTokenCount(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_token_mode_count"),
      new ExpressionInfo(classOf[TokenModeCount].getName, "graft_token_mode_count"),
      (children: Seq[Expression]) => TokenModeCount(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_first_colliding_band"),
      new ExpressionInfo(classOf[FirstCollidingBand].getName, "graft_first_colliding_band"),
      (children: Seq[Expression]) => FirstCollidingBand(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_sig_match_count"),
      new ExpressionInfo(classOf[SigMatchCount].getName, "graft_sig_match_count"),
      (children: Seq[Expression]) => SigMatchCount(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_intersect_count"),
      // the usage text carries the DISTINCT-INPUT precondition to SQL
      // callers: on duplicate-bearing arrays the count exceeds
      // size(array_intersect) (each duplicate probe-side hit counts),
      // so the bit-equality contract is scoped to distinct inputs
      new ExpressionInfo(classOf[IntersectCount].getName, null,
        "graft_intersect_count",
        "graft_intersect_count(a, b) - |a ∩ b| for two DISTINCT-element " +
          "bigint arrays; equals size(array_intersect(a, b)) only when " +
          "each input has no duplicate elements (duplicates are counted " +
          "per occurrence on the probe side).", ""),
      (children: Seq[Expression]) => IntersectCount(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_first_matching_chunk"),
      new ExpressionInfo(classOf[FirstMatchingChunk].getName, "graft_first_matching_chunk"),
      (children: Seq[Expression]) => FirstMatchingChunk(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "graft_shingle_hashes"),
      (children: Seq[Expression]) =>
        ShingleHashes(children(0), children(1).eval().asInstanceOf[Number].intValue)))
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Codegen'd vector expressions vs an independent HOF composition. */
class VectorExprsSpec extends SparkTestBase {

  private def vecs = sources.Tables.embeddings(spark, sfDir).limit(50)

  test("cosineSim(v, v) == 1 for non-zero vectors") {
    val rows = vecs.select(cosineSim(col("embedding"), col("embedding")).as("c")).collect()
    rows.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-9))
  }

  test("dotProduct matches zip_with/aggregate composition") {
    val df = vecs.as("a").crossJoin(vecs.as("b")).limit(200)
      .select(
        dotProduct(col("a.embedding"), col("b.embedding")).as("native"),
        expr("""aggregate(zip_with(a.embedding, b.embedding,
                 (x, y) -> cast(x as double) * cast(y as double)),
                 cast(0.0 as double), (acc, v) -> acc + v)""").as("composed"))
    df.collect().foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9,
        s"native=${r.getDouble(0)} composed=${r.getDouble(1)}")
    }
  }

  test("cosineSim is symmetric and bounded") {
    val df = vecs.as("a").crossJoin(vecs.as("b")).limit(300)
      .select(cosineSim(col("a.embedding"), col("b.embedding")).as("ab"),
        cosineSim(col("b.embedding"), col("a.embedding")).as("ba"))
    df.collect().foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12)
      assert(r.getDouble(0) <= 1.0 + 1e-9 && r.getDouble(0) >= -1.0 - 1e-9)
    }
  }
}

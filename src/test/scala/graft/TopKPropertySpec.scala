package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Randomized equivalence: the custom bounded-heap operator vs the
  * window formulation, across seeds that force ties, singleton groups,
  * and k larger than the group size.
  */
class TopKPropertySpec extends SparkTestBase {

  private def check(seed: Int, nRows: Int, nKeys: Int, nVals: Int, k: Int): Unit = {
    import spark.implicits._
    val rng = new scala.util.Random(seed)
    // low-cardinality vals produce plenty of order-ties; id breaks them
    val data = (0 until nRows).map { i =>
      (rng.nextInt(nKeys).toLong, i.toLong, rng.nextInt(nVals).toDouble)
    }
    val df = data.toDF("key", "id", "v").repartition(5)
    val expected = df.withColumn("rn", row_number().over(
        Window.partitionBy(col("key")).orderBy(col("v").desc, col("id"))))
      .filter(col("rn") <= k).drop("rn")
      .orderBy(col("key"), col("v").desc, col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val actual = plans.TopK.perKey(df, Seq("key"), "v", "id", k)
      .orderBy(col("key"), col("v").desc, col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(actual == expected, s"seed=$seed k=$k keys=$nKeys")
  }

  test("random datasets: heavy ties") { check(seed = 1, nRows = 500, nKeys = 7, nVals = 3, k = 4) }
  test("random datasets: many singleton groups") { check(seed = 2, nRows = 300, nKeys = 400, nVals = 100, k = 3) }
  test("random datasets: k exceeds group size") { check(seed = 3, nRows = 100, nKeys = 5, nVals = 50, k = 40) }
  test("random datasets: k = 1") { check(seed = 4, nRows = 400, nKeys = 20, nVals = 10, k = 1) }

  test("partial flush epochs preserve per-key top-k (the 400x OOM fix)") {
    // the partial stage flushes its heap map whenever the retained-row
    // budget fills (unbounded distinct-key cardinality OOM'd a 96 GB
    // heap at 400x); correctness contract: partial-with-any-flush
    // composed with the final re-heap equals the unflushed result,
    // including at flush budgets far below k and below the key count
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{Ascending, BoundReference, Descending, SortOrder, UnsafeProjection}
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
    import org.apache.spark.sql.types.{DataType, LongType}
    val rng = new scala.util.Random(7)
    val toUnsafe = UnsafeProjection.create(Array[DataType](LongType, LongType, LongType))
    val rows: IndexedSeq[InternalRow] = (0 until 5000).map { i =>
      toUnsafe(InternalRow(rng.nextInt(40).toLong, i.toLong, rng.nextInt(5).toLong))
        .copy().asInstanceOf[InternalRow]
    }
    def keyProj = UnsafeProjection.create(
      Seq(BoundReference(0, LongType, nullable = false)))
    def ord = GenerateOrdering.generate(Seq(
      SortOrder(BoundReference(2, LongType, nullable = false), Descending),
      SortOrder(BoundReference(1, LongType, nullable = false), Ascending)))
    def run(flush: Int): Seq[(Long, Long, Long)] = {
      val partial = plans.TopKExec.localTopK(rows.iterator, keyProj, ord, 3, flush).toArray
      plans.TopKExec.localTopK(partial.iterator, keyProj, ord, 3)
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    }
    val exact = run(Int.MaxValue)
    assert(exact.size == 40 * 3)
    Seq(1, 7, 64, 1000).foreach { f =>
      assert(run(f) == exact, s"flush=$f diverges from the unflushed top-k")
    }
  }

  test("TopKFilterPushdown moves key filters below the TopK node") {
    import spark.implicits._
    val df = (0 until 500).map(i => (i.toLong % 10, i.toLong, (i * 37 % 100).toDouble))
      .toDF("key", "id", "v").repartition(5)
    val filtered = plans.TopK.perKey(df, Seq("key"), "v", "id", k = 3)
      .filter(col("key") === 4)
    // optimized shape: the filter moves below the TopK node (and from
    // there keeps pushing — over a LocalRelation it's evaluated away
    // entirely by ConvertToLocalRelation), so the TopK node ends up at
    // the root with no Filter above it
    val optimized = filtered.queryExecution.optimizedPlan
    assert(optimized.isInstanceOf[plans.TopKPerKeyNode],
      s"filter should have been pushed off the top:\n$optimized")
    // and results match the filter-first construction
    val expected = plans.TopK.perKey(df.filter(col("key") === 4), Seq("key"), "v", "id", 3)
      .orderBy(col("v").desc, col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val actual = filtered
      .orderBy(col("v").desc, col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(actual == expected)
  }

  test("TopKValues aggregate matches the window formulation and partial-aggregates") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val df = (0 until 2000).map { i =>
      (rng.nextInt(13).toLong, i.toLong, rng.nextInt(40).toDouble)
    }.toDF("key", "id", "v").repartition(6)
    val agg = df.groupBy(col("key"))
      .agg(functions.TopKAggFunctions.topkAgg(col("v"), col("id"), 5).as("top"))
      .select(col("key"), posexplode(col("top")))
      .select(col("key"), (col("pos") + 1).as("rnk"), col("col.v").as("v"), col("col.tie").as("id"))
    val win = df.withColumn("rnk", row_number().over(
        Window.partitionBy(col("key")).orderBy(col("v").desc, col("id"))).cast("int"))
      .filter(col("rnk") <= 5).select(col("key"), col("rnk"), col("v"), col("id"))
    val a = agg.collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3))).toSet
    val w = win.collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3))).toSet
    assert(a == w, s"onlyAgg=${(a -- w).take(3)} onlyWin=${(w -- a).take(3)}")
    // partial aggregation: an ObjectHashAggregate pair with a partial stage
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") && plan.contains("partial_graft_topk"),
      s"expected partial object hash aggregation:\n$plan")
  }

  test("graft_topk is callable from SQL via extensions") {
    import spark.implicits._
    (0 until 100).map(i => (i % 5, i.toDouble)).toDF("g", "x")
      .createOrReplaceTempView("topk_sql")
    val rows = spark.sql(
      "SELECT g, graft_topk(x, CAST(g AS BIGINT), 2) AS t FROM topk_sql GROUP BY g").collect()
    assert(rows.length == 5)
  }

  test("duplicate column names bind by exprId, not name (self-join input)") {
    import spark.implicits._
    // A join output with TWO columns named "v" and two named "key":
    // name-based binding would silently resolve every reference to the
    // left side's attribute; exprId binding must order by the RIGHT
    // side's v (= 100 - left.v) and flip the ranking.
    val left = (0 until 60).map(i => (i.toLong % 4, i.toLong, (i % 10).toDouble))
      .toDF("key", "id", "v")
    val right = (0 until 10).map(i => (i.toDouble, 100.0 - i))
      .toDF("v", "vr")
    val joined = left.join(right, left("v") === right("v"))
    val top = plans.TopK.perKey(joined,
        keys = Seq(left("key")), order = right("vr"), tie = left("id"), k = 2)
      .select(left("key").as("key"), left("id").as("id"),
        left("v").as("lv"), right("vr").as("vr"))
      .orderBy(col("key"), col("vr").desc, col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    val w = Window.partitionBy(left("key")).orderBy(right("vr").desc, left("id"))
    val expected = joined.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .select(left("key").as("key"), left("id").as("id"),
        left("v").as("lv"), right("vr").as("vr"))
      .orderBy(col("key"), col("vr").desc, col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(top == expected)
    // ranking by vr means SMALL left-v rows win — catches a silent bind
    // of `order` to the left "v"
    assert(top.forall(_._3 <= 1.0), s"top-2 by vr must be the smallest left v: $top")
  }

  test("non-key filters stay above the TopK node (no unsound pushdown)") {
    import spark.implicits._
    val df = (0 until 500).map(i => (i.toLong % 10, i.toLong, (i * 37 % 100).toDouble))
      .toDF("key", "id", "v").repartition(5)
    val filtered = plans.TopK.perKey(df, Seq("key"), "v", "id", k = 3)
      .filter(col("v") > 50)
    val optimized = filtered.queryExecution.optimizedPlan
    assert(optimized.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Filter],
      s"value filter must stay ABOVE the TopK node:\n$optimized")
    assert(optimized.children.head.isInstanceOf[plans.TopKPerKeyNode],
      s"value filter must sit directly on the TopK node:\n$optimized")
  }
}

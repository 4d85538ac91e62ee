package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Bit parity of the native token-count kernel vs its regex twin —
  * the same guarantee HashExprsSpec gives the signature kernels.
  */
class TextExprsSpec extends SparkTestBase {

  private def regexTwin(c: org.apache.spark.sql.Column) =
    regexp_count(c, lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).cast("long")

  test("graft_token_count matches regexp_count on the documents corpus") {
    val df = sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        TextFunctions.bpeTokenCount(col("text")).as("native"),
        regexTwin(col("text")).as("regex"))
    assert(df.filter(col("native") =!= col("regex")).count() == 0)
    assert(df.filter(col("native") > 0).count() > 0)
  }

  test("graft_token_count edge cases match the regex") {
    import spark.implicits._
    val cases = Seq(
      "", " ", "   ", "abc", "abc def", "a1b2", "123 456", "a,b.c",
      "ABC", "aB cD", "a  b", "trailing ", " leading", "a-1-b",
      "héllo wörld", "中文 分词", "emoji 😀 ok", "x\ty\nz",
      "a" * 500, ("ab 12 !? " * 40).trim)
    val df = cases.toDF("t")
      .select(TextFunctions.bpeTokenCount(col("t")).as("native"),
        regexTwin(col("t")).as("regex"), col("t"))
    val bad = df.filter(col("native") =!= col("regex")).collect()
    assert(bad.isEmpty, bad.map(r => s"'${r.getString(2)}': native=${r.getLong(0)} regex=${r.getLong(1)}").mkString("; "))
  }

  test("graft_token_count is callable from SQL via extensions") {
    import spark.implicits._
    Seq("ab 12 x!").toDF("t").createOrReplaceTempView("tok_sql")
    val n = spark.sql("SELECT graft_token_count(t) AS n FROM tok_sql")
      .head().getLong(0)
    assert(n == 4L)
  }

  test("kernel interpreted and codegen paths agree") {
    // eval path directly
    import org.apache.spark.unsafe.types.UTF8String
    val s = "ab 12 x! 中"
    assert(graft.functions.TextKernels.bpeTokenCount(UTF8String.fromString(s)) == 5L)
  }

  private def modeHofTwin(toksCol: String) =
    expr(s"""aggregate(array_sort($toksCol),
      |  named_struct('prev', '', 'run', 0L, 'best', 0L),
      |  (acc, x) -> named_struct(
      |    'prev', x,
      |    'run', IF(x = acc.prev, acc.run + 1L, 1L),
      |    'best', greatest(acc.best, IF(x = acc.prev, acc.run + 1L, 1L))),
      |  acc -> acc.best)""".stripMargin)

  test("graft_token_mode_count matches the sorted-run HOF fold on the corpus") {
    val df = sources.Tables.documents(spark, sfDir)
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"),
        TextFunctions.tokenModeCount(col("toks")).as("native"),
        modeHofTwin("toks").as("hof"))
    assert(df.filter(col("native") =!= col("hof")).count() == 0)
    assert(df.filter(col("native") > 1).count() > 0)
  }

  test("graft_token_mode_count edge cases") {
    import spark.implicits._
    val cases = Seq(
      (Seq.empty[String], 0L), (Seq("a"), 1L), (Seq("a", "a", "a"), 3L),
      (Seq("a", "b", "a", "b", "a"), 3L), (Seq("", "", "x"), 2L),
      (Seq("中", "中", "wörld"), 2L),
      // null elements are SKIPPED (graft_token_mode_count is
      // SQL-exposed, so arbitrary arrays can reach the kernel) —
      // 2 nulls must not beat the real mode, and all-null → 0
      (Seq(null, "a", null, "a", "b"), 2L),
      (Seq[String](null, null), 0L))
    cases.foreach { case (toks, want) =>
      val got = Seq(toks).toDF("toks")
        .select(TextFunctions.tokenModeCount(col("toks"))).head().getLong(0)
      assert(got == want, s"$toks: got $got want $want")
    }
  }
}

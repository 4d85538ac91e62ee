package graft

/** Pins the PURCHASE-APPLY platform matrix (FundEtl.applyMatrix —
  * the reference's fourth chain, purchase_extractor.py:947-1110):
  * chain-specific signature scopes, the single-money-field contract,
  * placement modes, walk-level filename exclusions, the
  * code∧amount record rule, and zdt's single-vs-汇总 anchor formats.
  */
class ApplySpec extends SparkTestBase {

  private lazy val ingest = operators.FundEtl.etlApplyIngest(spark, sfDir)
    .collect().map(r => r.getAs[String]("file_name") -> r).toMap
  private lazy val multi = operators.FundEtl.etlApplyMulti(spark, sfDir)
    .collect()
    .map(r => (r.getAs[String]("file_name"), r.getAs[Long]("rec_no")) -> r)
    .toMap
  private lazy val rows = operators.FundEtl.etlApplyRows(spark, sfDir)
    .collect()
    .map(r => (r.getAs[String]("file_name"), r.getAs[Long]("row_no")) -> r)
    .toMap

  test("all 20 apply platforms classify at least one corpus file") {
    val want = operators.FundEtl.applyMatrix.map(_.platform).toSet
    assert(want.size == 20, s"matrix must carry 20 platforms, has ${want.size}")
    val missing = want -- ingest.values.map(_.getAs[String]("platform")).toSet
    assert(missing.isEmpty, s"platforms with no classified corpus file: $missing")
  }

  test("apply-chain signature scopes route as the reference") {
    val expect = Map(
      // ronglianchuang scopes 融联创 in lines[8:] in this chain
      "rlc_shengou_20240115.txt" -> "ronglianchuang",
      // the full negative conjunction: 宁波∧¬北极星 blocked → liantai
      "ningbo_shengou_20240115.txt" -> "ningbo",
      "stmt_nb_shengou_20240116.txt" -> "ningbo", // 宁波银行[15:] ∧ ¬联泰[:5]
      "ningbobeijixing_shengou_20240116.txt" -> "liantai",
      // guoxinjiali is a plain label platform in this chain
      "gxjl_shengou_20240115.txt" -> "guoxinjiali",
      // zdt: 证达通 ∧ 汇总-marker ∧ ¬超级 (first conjunct)
      "zdt_huizong_shengou_20240116.txt" -> "zhengdatong",
      // 证达通 ∧ 申购受理单 (second conjunct)
      "zdt_shengou_20240115.txt" -> "zhengdatong",
      // the ¬超级 negation kicks this out of zdt entirely
      "zdt_chaoji_shengou_20240116.txt" -> "UNKNOWN",
      "weizhi_shengou_20240116.txt" -> "UNKNOWN")
    expect.foreach { case (f, p) =>
      assert(ingest(f).getAs[String]("platform") == p, s"file $f")
    }
  }

  test("walk-level filename exclusions surface as EXCL_* classes") {
    val expect = Map(
      "haomai_shuhui_20240116.txt" -> "EXCL_RED",
      "pa_chaojizhuanhuan_20240116.txt" -> "EXCL_SUPER",
      "tt_fenhongshezhi_20240116.txt" -> "EXCL_DIV_SET",
      "lide_shixiao_20240116.txt" -> "EXCL_VOID",
      "shengou_hm_20240115.txt" -> "SUB") // default
    expect.foreach { case (f, b) =>
      assert(ingest(f).getAs[String]("biz_type") == b, s"file $f")
    }
  }

  test("wangjin amount: same-line leg and next-line leg both extract") {
    assert(ingest("wangjin_shengou_20240115.txt")
      .getAs[java.lang.Double]("apply_amount") != null)
    assert(ingest("wangjin2_shengou_20240116.txt")
      .getAs[java.lang.Double]("apply_amount") != null) // value on next line
  }

  test("multi-record apply: code∧amount drops the amount-less record") {
    val byFile = multi.keys.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byFile("yingmi_shengou_20240115.txt") == Set(1L)) // rec 2 dropped
    assert(byFile("beijixing_shengou_20240115.txt") == Set(1L)) // rec 2 no code
    assert(multi(("yingmi_shengou_20240115.txt", 1L))
      .getAs[Double]("apply_amount") == 30000.0)
  }

  test("zdt formats: single label path vs 汇总 code-anchor rows") {
    val single = rows(("zdt_shengou_20240115.txt", 0L))
    assert(single.getAs[String]("row_fmt") == "single")
    assert(single.getAs[String]("fund_code") == "583101")
    assert(single.getAs[Double]("apply_amount") == 60000000.0)
    // anchor row 1: amount on the same line after the code
    val a1 = rows(("zdt_huizong_shengou_20240116.txt", 1L))
    assert(a1.getAs[String]("row_fmt") == "anchor")
    assert(a1.getAs[String]("fund_code") == "583201")
    assert(a1.getAs[Double]("apply_amount") == 45000.0)
    // anchor row 2: amount at the start of the NEXT line
    val a2 = rows(("zdt_huizong_shengou_20240116.txt", 2L))
    assert(a2.getAs[String]("fund_code") == "583202")
    assert(a2.getAs[Double]("apply_amount") == 66500.0)
    assert(rows.size == 3)
  }
}

package graft

/** Pins the REDEMPTION platform matrix (FundEtl.redemptionMatrix —
  * the reference's second extractor chain,
  * redemption_extractor.py:1223-1290) to the intended routing,
  * date-mode arithmetic, fee defaults, section scoping and
  * record-validity variance of every round-17 redemption corpus
  * file, so a rule-data edit fails here even though the DuckDB
  * oracle (rendered from the same matrix) would move in lockstep.
  */
class RedemptionSpec extends SparkTestBase {

  private lazy val ingest = operators.FundEtl.etlRedeemIngest(spark, sfDir)
    .collect().map(r => r.getAs[String]("file_name") -> r).toMap
  private lazy val multi = operators.FundEtl.etlRedeemMulti(spark, sfDir)
    .collect()
    .map(r => (r.getAs[String]("file_name"), r.getAs[Long]("rec_no")) -> r)
    .toMap
  private lazy val rows = operators.FundEtl.etlRedeemRows(spark, sfDir)
    .collect().map(r => r.getAs[Long]("row_no") -> r).toMap

  test("all 17 redemption platforms classify at least one corpus file") {
    val want = operators.FundEtl.redemptionMatrix.map(_.platform).toSet
    assert(want.size == 17, s"matrix must carry 17 platforms, has ${want.size}")
    val seen = ingest.values.map(_.getAs[String]("platform")).toSet
    val missing = want -- seen
    assert(missing.isEmpty, s"platforms with no classified corpus file: $missing")
  }

  test("redemption-specific signatures route as the reference's chain") {
    val expect = Map(
      "queren_shuhui_hm_20240115.txt" -> "haomai", // 好买基金[:2] ∧ ¬转换
      "queren_shuhui_tt_20240115.txt" -> "tiantian", // 天天基金 in lines[3:]
      "tiantian_shuhui_20240116.txt" -> "tiantian", // filename leg
      "lide_shuhui_20240115.txt" -> "lide",
      "changliang_shuhui_20240115.txt" -> "changliang",
      "jiaoetong_shuhui_20240115.txt" -> "jiaohang", // filename 交e通
      "jtyh_shuhui_20240116.txt" -> "jiaohang", // 交通银行 in lines[:2]
      // jd keys on 赎回确认 here (申购确认 in the confirm chain)
      "kenteri_shuhuiqueren_20240115.txt" -> "jingdong",
      "wangjin_shuhui_20240115.txt" -> "wangjin",
      "pa_shuhui_20240115.txt" -> "pingan", // 行E通 in lines[5:]
      "jianhang_shuhui_20240115.txt" -> "jianhang",
      // 融联创[:2] ∧ 赎回[:5] (申购 in the confirm chain)
      "ronglianchuang_shuhui_20240115.txt" -> "ronglianchuang",
      "jiangsuyinhang_shengou_20240116.txt" -> "ronglianchuang", // filename leg
      "minshengtongye_shuhui_20240115.txt" -> "minsheng",
      "ms2_shuhui_20240116.txt" -> "minsheng", // 同业e+ in lines[2:]
      "panying_shuhui_20240115.txt" -> "panying",
      "yingmi_shuhui_20240115.txt" -> "yingmi",
      "beijixing_shuhui_20240115.txt" -> "liantai", // 北极星 ∧ 赎回[:15]
      "tengyuan_shuhui_20240115.txt" -> "tengyuan",
      "zhengdatong_shuhui_20240115.txt" -> "zhengdatong",
      // evaluated LAST: 肯特瑞 ∧ 转换 (filename), jd must NOT grab it
      "kenteri_chaojizhuanhuan_20240115.txt" -> "jd_conversion",
      "weizhi_shuhui_20240116.txt" -> "UNKNOWN")
    expect.foreach { case (f, p) =>
      assert(ingest(f).getAs[String]("platform") == p, s"file $f")
    }
  }

  test("the redemption walk's exclusion algebra routes as the reference") {
    val expect = Map(
      "queren_qiangxingtiao_hm_20240116.txt" -> "EXCL_FORCE_ADJ",
      "changliang_tiaozeng_20240116.txt" -> "EXCL_ADJ_UP",
      "panying_fenhongfangshi_20240116.txt" -> "EXCL_DIV_METHOD",
      // 申购 kept for 江苏银行 (the mirror of the confirm 赎回 rule)
      "jiangsuyinhang_shengou_20240116.txt" -> "RED",
      "lide_shengou_20240116.txt" -> "EXCL_SUB", // 申购 without exception
      "queren_shuhui_hm_20240115.txt" -> "RED") // default
    expect.foreach { case (f, b) =>
      assert(ingest(f).getAs[String]("biz_type") == b, s"file $f")
    }
  }

  test("date modes compute the reference's per-platform arithmetic") {
    def d(f: String) = Option(ingest(f).getAs[String]("arrival_date"))
    assert(d("queren_shuhui_hm_20240115.txt") == Some("20240118")) // hyphen
    assert(d("changliang_shuhui_20240115.txt") == Some("20240118")) // plain8
    assert(d("queren_shuhui_tt_20240115.txt") == Some("20240118")) // NEXT line
    assert(d("pa_shuhui_20240115.txt") == Some("20240117")) // T+3 → batch+2
    assert(d("pa2_shuhui_20240116.txt") == Some("20240120")) // direct-date leg
    assert(d("pa3_shuhui_20240116.txt") == Some("20240116")) // missing → batch
    assert(d("wangjin_shuhui_20240115.txt") == Some("20240115")) // today mode
    // per-platform fallback variance: haomai → run date, jd → empty
    assert(d("queren_shuhui_hm2_20240116.txt") == Some("20240116"))
    assert(d("kenteri_shuhuiqueren2_20240116.txt") == None)
  }

  test("fee defaults: wangjin/panying missing fee extracts 0.00, not NULL") {
    def fee(f: String) = Option(ingest(f).getAs[java.lang.Double]("fee"))
    assert(fee("wangjin_shuhui_20240115.txt") == Some(0.0))
    assert(fee("panying_shuhui_20240115.txt") == Some(0.0))
    assert(fee("wangjin2_shuhui_20240116.txt").exists(_ > 0.0)) // 费开户 present
    assert(fee("weizhi_shuhui_20240116.txt") == None) // UNKNOWN keeps NULL
  }

  test("jd_conversion extraction is scoped to the 强行赎回确认 section") {
    val withSection = ingest("kenteri_chaojizhuanhuan_20240115.txt")
    // the decoy 客户名称/基金代码 BEFORE the marker must be ignored
    assert(withSection.getAs[String]("fund_code") != "999999")
    assert(withSection.getAs[String]("fund_code") != null)
    assert(!withSection.getAs[String]("product_name").contains("不应提取"))
    assert(withSection.getAs[Boolean]("valid"))
    // no marker → every field empty, the row surfaces invalid
    val noSection = ingest("kenteri_chaojizhuanhuan2_20240116.txt")
    assert(noSection.getAs[String]("fund_code") == null)
    assert(noSection.getAs[String]("product_name") == null)
    assert(!noSection.getAs[Boolean]("valid"))
  }

  test("record-validity variance: yingmi or-rule vs liantai strict vs tengyuan code-only") {
    val byFile = multi.keys.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // yingmi: rec 2 has code but neither amount nor shares → dropped;
    // rec 3 is shares-only → KEPT (the or-leg)
    assert(byFile("yingmi_shuhui_20240115.txt") == Set(1L, 3L))
    // liantai: rec 2 lacks code, rec 3 lacks amount → both dropped
    assert(byFile("beijixing_shuhui_20240115.txt") == Set(1L))
    // tengyuan: code-only rule keeps the amount-less rec 2
    assert(byFile("tengyuan_shuhui_20240115.txt") == Set(1L, 2L))
    // liantai fee rides the rule's 0.00 default only when absent;
    // rec 1 carries its own
    assert(multi(("beijixing_shuhui_20240115.txt", 1L))
      .getAs[Double]("fee") == 30.0)
    // per-record dates: yingmi rec1 has one, the shares-only rec3 none
    assert(multi(("yingmi_shuhui_20240115.txt", 1L))
      .getAs[String]("arrival_date") == "20240118")
    assert(multi(("yingmi_shuhui_20240115.txt", 3L))
      .getAs[String]("arrival_date") == null)
    // tengyuan per-record date defaults to the run date
    assert(multi(("tengyuan_shuhui_20240115.txt", 2L))
      .getAs[String]("arrival_date") == "20240115")
  }

  test("zdt dual row shapes: compact priority over the standard parse") {
    assert(rows.size == 3) // header + name lines do not match
    val std = rows(3L)
    assert(std.getAs[String]("row_fmt") == "standard")
    assert(std.getAs[String]("fund_code") == "000888")
    assert(std.getAs[Double]("shares") == 900.0) // 赎回份额 1,000.00 skipped
    assert(std.getAs[Double]("amount") == 8910.0)
    val cmp = rows(4L)
    assert(cmp.getAs[String]("row_fmt") == "compact")
    assert(cmp.getAs[String]("account") == "22345678901234")
    assert(cmp.getAs[String]("fund_code") == "000999")
    assert(cmp.getAs[Double]("fee") == 3.0)
  }
}

package graft

/** Pins the conversion (超级转换) walk — FundEtl.convMatrix /
  * etlConvIngest (conversion_extractor.py): the inclusion filename
  * filter, the two-platform chain, jd labels vs tiantian pair-next
  * positional extraction, the dual fee strategies, the derived
  * 转入金额, and the conversion-specific dict.
  */
class ConversionSpec extends SparkTestBase {

  private lazy val rows = operators.FundEtl.etlConvIngest(spark, sfDir)
    .collect().map(r => r.getAs[String]("file_name") -> r).toMap

  test("two-platform chain: jd filename/content legs, tiantian filename only") {
    assert(rows("kenterijijin_chaojizhuanhuan_20240115.txt")
      .getAs[String]("platform") == "jingdong")
    assert(rows("stmt_chaojizhuanhuan_jd2_20240115.txt")
      .getAs[String]("platform") == "jingdong")
    assert(rows("tiantian_zhuanhuan_20240115.txt")
      .getAs[String]("platform") == "tiantian")
    assert(rows("weizhi_zhuanhuan_20240116.txt")
      .getAs[String]("platform") == "UNKNOWN")
  }

  test("inclusion filter: a file without 超级/转换 in its name is EXCL_NOT_CONV") {
    assert(rows("kenterijijin_queren_20240116.txt")
      .getAs[String]("biz_type") == "EXCL_NOT_CONV")
    assert(rows("tiantian_chaoji_20240116.txt")
      .getAs[String]("biz_type") == "CONV")
  }

  test("tiantian pair-next: shares-then-amount pair, single in-leg value") {
    val t = rows("tiantian_zhuanhuan_20240115.txt")
    assert(t.getAs[Double]("out_shares") == 30000.0)
    assert(t.getAs[Double]("out_amount") == 36000.0)
    assert(t.getAs[Double]("in_shares") == 28800.0)
  }

  test("fee strategies and the derived 转入金额 = 转出金额 − 手续费") {
    // strategy A: money on the 手续费 line; derived 36000 − 20
    val a = rows("tiantian_zhuanhuan_20240115.txt")
    assert(a.getAs[Double]("conv_fee") == 20.0)
    assert(a.getAs[Double]("in_amount") == 35980.0)
    // strategy B: the money-before-a-paren on the PREVIOUS line
    val b = rows("tiantian_chaoji_20240116.txt")
    assert(b.getAs[Double]("conv_fee") == 719.97)
    assert(b.getAs[Double]("in_amount") == 11280.03)
    // jd reads 转入基金确认金额 directly — never derived
    assert(rows("kenterijijin_chaojizhuanhuan_20240115.txt")
      .getAs[Double]("in_amount") == 49970.0)
  }

  test("the conversion walk uses its OWN dict and the 万联 two-line name") {
    assert(rows("tiantian_zhuanhuan_20240115.txt")
      .getAs[String]("product_name") == "万联稳健配置混合计划A期")
    assert(rows("tiantian_zhuanhuan_20240115.txt")
      .getAs[String]("conv_ledger") == "C002")
    assert(rows("kenterijijin_queren_20240116.txt")
      .getAs[String]("conv_ledger") == "UNMAPPED")
  }
}

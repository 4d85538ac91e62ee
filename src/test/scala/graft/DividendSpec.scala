package graft

/** Pins the DIVIDEND platform matrix (FundEtl.dividendMatrix — the
  * reference's third extractor chain, dividend_extractor.py:1301-1443)
  * to the intended routing, value-coupling, value-placement modes,
  * end-date arithmetic, record-validity rules, zdt tabular/single
  * fallback and the group-merge semantics of the round-17 dividend
  * corpus, so a rule-data edit fails here even though the DuckDB
  * oracle (rendered from the same matrix) moves in lockstep.
  */
class DividendSpec extends SparkTestBase {

  private lazy val ingest = operators.FundEtl.etlDivIngest(spark, sfDir)
    .collect().map(r => r.getAs[String]("file_name") -> r).toMap
  private lazy val multi = operators.FundEtl.etlDivMulti(spark, sfDir)
    .collect()
    .map(r => (r.getAs[String]("file_name"), r.getAs[Long]("rec_no")) -> r)
    .toMap
  private lazy val rows = operators.FundEtl.etlDivRows(spark, sfDir)
    .collect()
    .map(r => (r.getAs[String]("file_name"), r.getAs[Long]("row_no")) -> r)
    .toMap
  private lazy val merged = operators.FundEtl.etlDivMerge(spark, sfDir)
    .collect()
    .map(r => (r.getAs[String]("ledger_id"), r.getAs[String]("fund_code")) -> r)
    .toMap

  test("all 23 dividend platforms classify at least one corpus file") {
    val want = operators.FundEtl.dividendMatrix.map(_.platform).toSet
    assert(want.size == 23, s"matrix must carry 23 platforms, has ${want.size}")
    val missing = want -- ingest.values.map(_.getAs[String]("platform")).toSet
    assert(missing.isEmpty, s"platforms with no classified corpus file: $missing")
  }

  test("dividend-chain signature variants route as the reference") {
    val expect = Map(
      "fenhong_hm_20240115.txt" -> "haomai", // no ¬转换 in this chain
      "fenhong_tt_20240115.txt" -> "tiantian",
      "fenhong_xz_20240115.txt" -> "xingzheng",
      // jd's dividend FILENAME clause is 肯特瑞基金, not 肯特瑞
      "kenterijijin_fenhong_20240116.txt" -> "jingdong",
      "fenhong_jd_20240115.txt" -> "jingdong", // 肯特瑞 in lines[:2]
      // liantai has NO 赎回/申购 conjunct in this chain
      "beijixing_fenhong_20240115.txt" -> "liantai",
      // ningbo keys on 同业客户付款账户信息 in lines[5:], no ¬北极星
      "nb_fenhong_20240115.txt" -> "ningbo",
      "wanlianzhenxuan3hao_jiaoyiquerendan_20240115.txt" -> "guoxinjiali",
      "zdt2_fenhong_20240116.txt" -> "zhengdatong",
      "weizhi_fenhong_20240116.txt" -> "UNKNOWN")
    expect.foreach { case (f, p) =>
      assert(ingest(f).getAs[String]("platform") == p, s"file $f")
    }
  }

  test("value-coupled platforms copy the one extracted number to both fields") {
    Seq("fenhong_xz_20240115.txt", "changliang_fenhong_20240115.txt",
      "pa_fenhong_20240115.txt", "jiaoetong_fenhong_20240115.txt",
      "jianhang_fenhong_20240115.txt", "minshengtongye_fenhong_20240115.txt")
      .foreach { f =>
        val r = ingest(f)
        val a = r.getAs[java.lang.Double]("div_amount")
        val sh = r.getAs[java.lang.Double]("div_shares")
        assert(a != null && a == sh, s"$f: amount $a != shares $sh")
      }
    // distinct-label platforms stay distinct
    val hm = ingest("fenhong_hm_20240115.txt")
    assert(hm.getAs[Double]("div_amount") != hm.getAs[Double]("div_shares"))
  }

  test("value-placement modes: next-line (tiantian) and same-then-next (hexun/panying)") {
    val tt = ingest("fenhong_tt_20240115.txt")
    assert(tt.getAs[java.lang.Double]("div_amount") != null) // value on next line
    assert(tt.getAs[java.lang.Double]("div_shares") != null)
    val hx = ingest("hexun_fenhong_20240115.txt")
    assert(hx.getAs[java.lang.Double]("div_amount") != null) // same-line [(]元[)]
    assert(hx.getAs[java.lang.Double]("div_shares") != null) // next-line leg
    val py = ingest("panying_fenhong_20240115.txt")
    assert(py.getAs[java.lang.Double]("div_shares") != null) // strategy-B leg
  }

  test("红利截止日期: confirm-minus-1 for jiaohang, run-date-minus-1 otherwise") {
    // jiaohang: 确认日期 20240116 → 20240115
    assert(ingest("jiaoetong_fenhong_20240115.txt")
      .getAs[String]("div_end_date") == "20240115")
    // default: batch 20240115 → 20240114
    assert(ingest("fenhong_hm_20240115.txt")
      .getAs[String]("div_end_date") == "20240114")
  }

  test("guoxinjiali token row: code before 分红, value 6 tokens after, name from filename") {
    val gx = ingest("wanlianzhenxuan3hao_jiaoyiquerendan_20240115.txt")
    assert(gx.getAs[String]("fund_code") == "710501")
    assert(gx.getAs[Double]("div_amount") == 87.09)
    assert(gx.getAs[Double]("div_shares") == 87.09)
    assert(gx.getAs[String]("product_name") == "wanlianzhenxuan3hao")
  }

  test("record validity: yingmi needs all three, liantai code∧shares with amount=shares") {
    val byFile = multi.keys.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // yingmi record 2 lacks 分红金额 → dropped by the all-three rule
    assert(byFile("yingmi_fenhong_20240115.txt") == Set(1L))
    // liantai record 2 lacks 基金代码 → dropped; record 1's amount
    // equals its shares (the reference's coupling, :860-862)
    assert(byFile("beijixing_fenhong_20240115.txt") == Set(1L))
    val lt = multi(("beijixing_fenhong_20240115.txt", 1L))
    assert(lt.getAs[Double]("div_amount") == 2500.0)
    assert(lt.getAs[Double]("div_shares") == 2500.0)
  }

  test("zdt: tabular rows win; a file with no tabular row falls back to single-bill") {
    val std = rows(("zhengdatong_fenhong_20240115.txt", 3L))
    assert(std.getAs[String]("row_fmt") == "standard")
    assert(std.getAs[String]("fund_code") == "000888")
    assert(std.getAs[Double]("div_amount") == 1154.93)
    val cmp = rows(("zhengdatong_fenhong_20240115.txt", 4L))
    assert(cmp.getAs[String]("row_fmt") == "compact")
    assert(cmp.getAs[String]("fund_code") == "000999")
    val single = rows(("zdt2_fenhong_20240116.txt", 0L))
    assert(single.getAs[String]("row_fmt") == "single")
    assert(single.getAs[String]("fund_code") == "001234")
    assert(single.getAs[Double]("div_amount") == 3300.0) // = 分红份额
  }

  test("group-merge sums legs and joins platforms 、-style in first-seen order") {
    val m = merged(("L001", "000777"))
    assert(m.getAs[Long]("div_amount_e2") == 75000L) // 600.00 + 150.00
    assert(m.getAs[Long]("div_shares_e2") == 62500L) // 500.00 + 125.00
    assert(m.getAs[String]("platforms") == "haomai、jiyu")
    assert(m.getAs[Long]("n_legs") == 2L)
    // unmapped products drop out (the pandas NaN-group contract)
    assert(!merged.keys.exists(_._1 == "UNMAPPED"))
    // zdt tabular rows feed the merge as individual legs
    assert(merged(("L001", "000888")).getAs[String]("platforms") == "zhengdatong")
  }
}

#!/usr/bin/env python3
"""Generate the deterministic statement-file corpus under data/statements/.

Mirrors the reference's input layout (dated folders of per-platform
fund-statement text files walked by os.walk — see
/root/reference/extractors/purchase_confirm_extractor.py:1417-1461):
6 platforms x 4 business types x 2 batch dates, plus two defect files
(unknown platform; missing fund code) that exercise the failed-file
tracking path. Fully deterministic — no randomness, no timestamps —
so the files can be committed and oracled byte-for-byte.

Run once from the repo root: python3 tools/gen_statements.py
"""
import os
import sys

# default: the committed corpus. Optional args for scale measurement:
#   python3 tools/gen_statements.py /tmp/statements_10k 208
# writes <n_dates> dated folders (48 files each) to the given dir.
ROOT = sys.argv[1] if len(sys.argv) > 1 else \
    os.path.join(os.path.dirname(__file__), "..", "data", "statements")
N_DATES = int(sys.argv[2]) if len(sys.argv) > 2 else 0

# (pinyin, signature line, amount label, fee label, date style)
PLATFORMS = [
    ("haomai",     "【好买基金】交易确认单",   "确认金额", "手续费",   "cn"),
    ("tiantian",   "天天基金网结算数据",       "成交金额", "费用",     "iso"),
    ("yingmi",     "盈米财富对账单",           "交易金额", "手续费",   "slash"),
    ("jingdong",   "京东肯特瑞交易回执",       "确认金额", "手续费",   "compact"),
    ("pingan",     "平安银行代销确认",         "发生金额", "费用合计", "dot"),
    ("changliang", "长量基金确认数据",         "确认金额", "手续费",   "iso"),
]

# filename keyword -> business label (申购确认 contains 申购: the
# classifier must apply the reference's exclusion ordering)
BIZ = [
    ("shengouqueren", "申购确认"),
    ("shengou",       "申购"),
    ("shuhui",        "赎回"),
    ("fenhong",       "分红"),
]

PRODUCTS = [
    "安鑫回报混合A", "稳健增利债券C", "创新成长股票", "货币增值宝B",
    "价值精选混合", "量化对冲多策略",
]

def _dates():
    if N_DATES <= 0:
        return ["20240115", "20240116"]
    out = []
    y, m = 2024, 1
    d = 1
    for _ in range(N_DATES):
        out.append(f"{y}{m:02d}{d:02d}")
        d += 1
        if d > 28:
            d = 1; m += 1
            if m > 12:
                m = 1; y += 1
    return out

DATES = _dates()


def fmt_date(d, style):
    y, m, dd = d[:4], d[4:6], d[6:8]
    return {
        "cn": f"{y}年{m}月{dd}日",
        "iso": f"{y}-{m}-{dd}",
        "slash": f"{y}/{m}/{dd}",
        "compact": d,
        "dot": f"{y}.{m}.{dd}",
    }[style]


def money(cents):
    return f"{cents // 100:,}.{cents % 100:02d}"


def body(sig, product, code, biz_label, amt_label, fee_label, date_label,
         amount_c, shares_c, fee_c, include_code=True):
    lines = [sig, f"产品名称：{product}"]
    if include_code:
        lines.append(f"基金代码：{code:06d}")
    lines += [
        f"业务类型：{biz_label}",
        f"{amt_label}：{money(amount_c)}",
        f"确认份额：{money(shares_c)}",
        f"{fee_label}：{money(fee_c)}",
        f"确认日期：{date_label}",
    ]
    return "\n".join(lines) + "\n"


# ---------------------------------------------------------------------------
# Round 17: the reference's full 23-platform matrix
# (purchase_confirm_extractor.py:1480-1568). The 17 platforms below are
# NEW relative to the v1 corpus; each template places its signature
# token at the reference's line scope (e.g. 行E通 in lines[5:],
# 宁波银行 in lines[15:]) and uses the reference's per-platform field
# labels (:34-1365). Filenames stay ASCII pinyin (byte-stable across
# URI-encoding path layers); the pinyin token stands for the
# reference's Chinese filename keyword (jiangsuyinhang = 江苏银行,
# beijixing = 北极星, ...). Emitted only for the committed default
# corpus — scale mode (N_DATES > 0) keeps the v1 6-platform shape so
# committed scale measurements stay comparable.
#
# (date, filename, [lines], date style) — {product}/{code}/{amount}/
# {shares}/{fee}/{date} substituted per file, values deterministic.
NEW_FILES = [
    # --- 20240115: one base file per new platform -----------------------
    ("20240115", "lide_shengou_20240115.txt", [
        "基金交易确认书", "投资者姓名/名称：{product}", "基金代码：{code}",
        "业务类型：申购", "利得基金销售有限公司",
        "确认金额（元）：{amount}", "确认份额（份）：{shares}",
        "交易费用（元）：{fee}", "确认日期：{date}"], "iso"),
    ("20240115", "jiaohang_shengouqueren_20240115.txt", [
        "交通银行基金交易确认单", "投资者信息：{product}", "产品代码：{code}",
        "确认金额：{amount}", "确认份额：{shares}", "认申购手续费：{fee}",
        "确认日期：{date}"], "cn"),
    # jd conjunction: 肯特瑞 AND 申购确认, both in lines[:2]
    ("20240115", "kenteri_shengouqueren_20240115.txt", [
        "京东肯特瑞基金销售有限公司", "申购确认回执", "产品名称：{product}",
        "基金代码：{code}", "确认金额：{amount}", "确认份额：{shares}",
        "手续费：{fee}", "确认日期：{date}"], "compact"),
    ("20240115", "wangjin_shengou_20240115.txt", [
        "基金申购业务确认通知", "投资者名称：{product}", "基金代码：{code}",
        "申购金额小写：{amount}", "确认净额：{shares}", "费开户：{fee}",
        "网金基金销售服务有限公司", "确认日期：{date}"], "iso"),
    # pingan reference shape: 行E通 first appears in lines[5:]
    ("20240115", "stmt_pa_shengou_20240115.txt", [
        "平安银行股份有限公司", "基金交易确认通知书", "产品名称：{product}",
        "基金代码：{code}", "发生金额：{amount}", "确认份额：{shares}",
        "行E通交易平台", "费用合计：{fee}", "确认日期：{date}"], "dot"),
    ("20240115", "jianhang_shengouqueren_20240115.txt", [
        "基金份额确认通知", "客 户 名 称：{product}", "基 金 代 码：{code}",
        "确 认 金 额：{amount}", "确 认 份 额：{shares}", "手续费：{fee}",
        "确认日期：{date}"], "slash"),
    ("20240115", "tengyuan_shengou_20240115.txt", [
        "基金交易确认单", "客户名称：{product}", "基金代码：{code}",
        "确认金额：{amount}", "确认份额：{shares}", "腾元基金销售有限公司",
        "手续费：{fee}", "确认日期：{date}"], "iso"),
    ("20240115", "ronglianchuang_shengou_20240115.txt", [
        "融联创同业交易平台确认单", "申购业务确认", "来款账号名称：{product}",
        "产品代码：{code}", "确认金额：{amount}", "确认份额：{shares}",
        "手续费：{fee}", "确认日期：{date}"], "cn"),
    ("20240115", "minsheng_shengou_20240115.txt", [
        "基金交易确认通知书", "客户名称：{product}", "民生银行同业e+交易平台",
        "产品代码：{code}", "确认金额（元）：{amount}",
        "确认份额（份）：{shares}", "手续费（元）：{fee}",
        "确认日期：{date}"], "iso"),
    ("20240115", "hexun_shengouqueren_20240115.txt", [
        "基金电子对账单", "账户名称：{product}", "基金代码：{code}",
        "和讯信息科技有限公司", "确认金额：{amount}", "确认份额：{shares}",
        "确认费用：{fee}", "确认日期：{date}"], "compact"),
    ("20240115", "zhaoyingtong_shengou_20240115.txt", [
        "招赢通理财交易确认单", "投资者名称：{product}", "产品代码：{code}",
        "确认金额：{amount}", "确认份额：{shares}", "交易费用：{fee}",
        "确认日期：{date}"], "iso"),
    ("20240115", "xingzheng_shengouqueren_20240115.txt", [
        "兴证全球基金管理有限公司", "账 号 名 称：{product}",
        "基 金 代 码：{code}", "确 认 金 额：{amount}",
        "确 认 份 额：{shares}", "手 续 费：{fee}", "确认日期：{date}"], "cn"),
    # youchu classifies by FILENAME only (reference has no content clause)
    ("20240115", "youchu_shengouqueren_20240115.txt", [
        "中国邮政储蓄银行基金交易确认单", "客户名称：{product}",
        "产品代码：{code}", "确认金额（元）：{amount}",
        "确认份额（份）：{shares}", "手续费（元）：{fee}",
        "确认日期：{date}"], "iso"),
    ("20240115", "jiyu_shengou_20240115.txt", [
        "基煜基金销售有限公司交易确认单", "账户名称：{product}",
        "产品代码：{code}", "确认金额：{amount}", "确认份额：{shares}",
        "手续费：{fee}", "确认日期：{date}"], "slash"),
    ("20240115", "ningbo_shengouqueren_20240115.txt", [
        "基金交易确认通知书", "客户名称：{product}", "产品代码：{code}",
        "确认金额（元）：{amount}", "确认份额（份）：{shares}",
        "申购费用（元）：{fee}", "确认日期：{date}"], "iso"),
    ("20240115", "guoxinjiali_shengou_20240115.txt", [
        "国信嘉利基金销售有限公司", "账户名称：{product}", "产品代码：{code}",
        "确认金额：{amount}", "确认份额：{shares}", "手续费：{fee}",
        "确认日期：{date}"], "cn"),
    ("20240115", "panying_shengou_20240115.txt", [
        "攀赢基金电子交易确认单", "客户名称：{product}", "产品代码：{code}",
        "确认金额：{amount}", "确认份额：{shares}", "手续费：{fee}",
        "确认日期：{date}"], "iso"),
    ("20240115", "zhengdatong_shengouqueren_20240115.txt", [
        "证达通基金销售结算平台", "基金申购确认单", "基金名称：{product}",
        "基金代码：{code}", "确认金额：{amount}", "确认份额：{shares}",
        "手续费：{fee}", "确认日期：{date}"], "compact"),
    # liantai via its CONTENT clause (联泰 in lines[:2] + 申购 in lines[:20])
    ("20240115", "stmt_lt_shengou_20240115.txt", [
        "联泰基金销售平台交易确认单", "投资账户：{product}", "交易信息（1/1）",
        "业务类型：申购", "基金代码：{code}", "确认金额（元）：{amount}",
        "确认份额（份）：{shares}", "手续费（元）：{fee}",
        "确认日期：{date}"], "iso"),
    # tiantian via its reference clause (天天基金 in lines[3:], no 转换)
    ("20240115", "stmt_tt_shengou_20240115.txt", [
        "基金电子交易对账单", "产品名称：{product}", "基金代码：{code}",
        "业务类型：申购", "天天基金网运营数据中心", "成交金额：{amount}",
        "确认份额：{shares}", "费用：{fee}", "确认日期：{date}"], "iso"),
    # --- 20240116: scope variants, tricky negatives, exclusions ---------
    # jiaohang via its FILENAME clause (交e通 -> jiaoetong)
    ("20240116", "jiaoetong_shengouqueren_20240116.txt", [
        "基金交易确认通知单", "投资者信息：{product}", "产品代码：{code}",
        "确认金额：{amount}", "确认份额：{shares}", "认申购手续费：{fee}",
        "确认日期：{date}"], "cn"),
    # wangjin via its content clause (网金基金 in lines[5:])
    ("20240116", "stmt_wj_shengou_20240116.txt", [
        "基金申购业务确认通知", "投资者名称：{product}", "基金代码：{code}",
        "申购金额小写：{amount}", "确认净额：{shares}", "费开户：{fee}",
        "网金基金销售服务有限公司", "确认日期：{date}"], "iso"),
    # jianhang via its content clause (spaced 客 户 名 称)
    ("20240116", "stmt_jh_shengouqueren_20240116.txt", [
        "基金份额确认通知", "客 户 名 称：{product}", "基 金 代 码：{code}",
        "确 认 金 额：{amount}", "确 认 份 额：{shares}", "手续费：{fee}",
        "确认日期：{date}"], "slash"),
    # hexun via its content clause (和讯信息科技有限公司 in lines[3:])
    ("20240116", "stmt_hx_shengouqueren_20240116.txt", [
        "基金电子对账单", "账户名称：{product}", "基金代码：{code}",
        "和讯信息科技有限公司", "确认金额：{amount}", "确认份额：{shares}",
        "确认费用：{fee}", "确认日期：{date}"], "compact"),
    # ningbo via its content clause: 宁波银行 first appears at line 15
    ("20240116", "stmt_nb_shengou_20240116.txt", [
        "基金交易确认通知书", "客户名称：{product}", "产品代码：{code}",
        "确认金额（元）：{amount}", "确认份额（份）：{shares}",
        "申购费用（元）：{fee}", "确认日期：{date}",
        "备注：本通知书仅供对账使用", "风险提示：基金投资需谨慎",
        "第一页 共一页", "客服热线：95574", "本页以下无正文",
        "——", "——", "——", "宁波银行股份有限公司代理销售"], "iso"),
    # the reference's trickiest negative conjunction: filename has BOTH
    # 宁波(ningbo) and 北极星(beijixing) -> ningbo's ¬北极星 blocks, and
    # the 北极星 filename clause routes it to liantai
    ("20240116", "ningbobeijixing_shengou_20240116.txt", [
        "联泰基金销售平台交易确认单", "投资账户：{product}", "交易信息（1/1）",
        "业务类型：申购", "基金代码：{code}", "确认金额（元）：{amount}",
        "确认份额（份）：{shares}", "手续费（元）：{fee}",
        "确认日期：{date}"], "iso"),
    # 赎回-in-filename kept as a purchase CONFIRM for 江苏银行 (the
    # reference's exception, :1459-1461); platform = ronglianchuang
    ("20240116", "jiangsuyinhang_shuhui_20240116.txt", [
        "江苏银行同业平台交易确认单", "申购业务确认", "来款账号名称：{product}",
        "产品代码：{code}", "确认金额：{amount}", "确认份额：{shares}",
        "手续费：{fee}", "确认日期：{date}"], "cn"),
    # 赎回 WITHOUT the exception -> RED (contrast case)
    ("20240116", "ningbo_shuhui_20240116.txt", [
        "基金交易确认通知书", "客户名称：{product}", "产品代码：{code}",
        "确认金额（元）：{amount}", "确认份额（份）：{shares}",
        "申购费用（元）：{fee}", "确认日期：{date}"], "iso"),
    # exclusion classes (强行调/调增/超级转换/分红方式) route to EXCL_*
    ("20240116", "haomai_qiangxingtiao_20240116.txt", [
        "【好买基金】交易确认单", "产品名称：{product}", "基金代码：{code}",
        "业务类型：申购", "确认金额：{amount}", "确认份额：{shares}",
        "手续费：{fee}", "确认日期：{date}"], "cn"),
    ("20240116", "tiantian_tiaozeng_20240116.txt", [
        "天天基金网结算数据", "产品名称：{product}", "基金代码：{code}",
        "业务类型：申购", "成交金额：{amount}", "确认份额：{shares}",
        "费用：{fee}", "确认日期：{date}"], "iso"),
    ("20240116", "panying_chaojizhuanhuan_20240116.txt", [
        "攀赢基金电子交易确认单", "客户名称：{product}", "产品代码：{code}",
        "确认金额：{amount}", "确认份额：{shares}", "手续费：{fee}",
        "确认日期：{date}"], "iso"),
    ("20240116", "youchu_fenhongfangshi_20240116.txt", [
        "中国邮政储蓄银行基金交易确认单", "客户名称：{product}",
        "产品代码：{code}", "确认金额（元）：{amount}",
        "确认份额（份）：{shares}", "手续费（元）：{fee}",
        "确认日期：{date}"], "iso"),
    # 转换-in-CONTENT negations: these match tiantian/haomai signature
    # positions but carry 转换, so the ¬转换 literal must kick them to
    # UNKNOWN (and the filename routes biz to EXCL_CONVERT)
    ("20240116", "stmt_tt_zhuanhuan_20240116.txt", [
        "基金电子交易对账单", "产品名称：{product}", "基金代码：{code}",
        "业务类型：基金转换", "天天基金网运营数据中心", "成交金额：{amount}",
        "确认份额：{shares}", "费用：{fee}", "确认日期：{date}"], "iso"),
    ("20240116", "stmt_hm_zhuanhuan_20240116.txt", [
        "【好买基金】交易确认单", "产品名称：{product}", "基金代码：{code}",
        "业务类型：基金转换", "确认金额：{amount}", "确认份额：{shares}",
        "手续费：{fee}", "确认日期：{date}"], "iso"),
    # MULTI-RECORD statements (the reference's yingmi/liantai
    # extractors return record LISTS, purchase_confirm_extractor.py
    # :173-271/:660-726). Values are literals so the spec can pin
    # them; record 2 of the liantai file deliberately lacks 基金代码 —
    # the reference's record-validity rule must drop it.
    ("20240115", "stmt_lt2_shengou_20240115.txt", [
        "联泰基金销售平台交易确认单", "投资账户：{product}", "业务类型：申购",
        "交易信息（1/3）", "基金代码：000222", "确认金额（元）：20,000.00",
        "确认份额（份）：15,000.00", "手续费（元）：30.00",
        "交易信息（2/3）", "确认金额（元）：7,500.00",
        "确认份额（份）：5,000.00", "手续费（元）：11.25",
        "交易信息（3/3）", "基金代码：000333", "确认金额（元）：40,000.00",
        "确认份额（份）：30,000.00", "手续费（元）：60.00",
        "确认日期：{date}"], "iso"),
    ("20240116", "yingmi2_shengou_20240116.txt", [
        "盈米财富基金对账单", "产品名称：{product}",
        "交易序号：1 交易类型：申购", "基金代码：000444",
        "交易金额：10,000.00", "确认份额：6,000.00", "手续费：15.00",
        "交易序号：2 交易类型：申购", "基金代码：000555",
        "交易金额：12,500.00", "确认份额：7,500.00", "手续费：18.75",
        "确认日期：{date}"], "iso"),
]


def write_new_platform_files():
    for j, (d, name, lines, style) in enumerate(NEW_FILES):
        amount_c = 90_00_00 + j * 23_45_67   # deterministic cents
        shares_c = amount_c * 3 // 4
        fee_c = amount_c * 12 // 10000
        code = 100 + (j * 13) % 400
        body = "\n".join(lines).format(
            product=PRODUCTS[j % len(PRODUCTS)],
            code=f"{code:06d}",
            amount=money(amount_c),
            shares=money(shares_c),
            fee=money(fee_c),
            date=fmt_date(d, style)) + "\n"
        folder = os.path.join(ROOT, d)
        os.makedirs(folder, exist_ok=True)
        with open(os.path.join(folder, name), "w") as f:
            f.write(body)


def main():
    i = 0
    for d in DATES:
        folder = os.path.join(ROOT, d)
        os.makedirs(folder, exist_ok=True)
        for p_idx, (pin, sig, amt_label, fee_label, style) in enumerate(PLATFORMS):
            for b_idx, (bkey, blabel) in enumerate(BIZ):
                amount_c = 100_00_00 + i * 12_34_56  # deterministic cents
                shares_c = amount_c * 2 // 3
                fee_c = amount_c * 15 // 10000
                code = 1 + (i * 7) % 500
                product = PRODUCTS[(p_idx + b_idx) % len(PRODUCTS)]
                text = body(sig, product, code, blabel, amt_label, fee_label,
                            fmt_date(d, style), amount_c, shares_c, fee_c)
                name = f"{pin}_{bkey}_{d}.txt"
                with open(os.path.join(folder, name), "w") as f:
                    f.write(text)
                i += 1
    # defect 1: unknown platform signature -> platform UNKNOWN
    with open(os.path.join(ROOT, "20240116", "weizhi_shengou_20240116.txt"), "w") as f:
        f.write(body("未知平台数据", PRODUCTS[0], 777, "申购", "确认金额",
                     "手续费", fmt_date("20240116", "iso"),
                     55_00_00, 36_66_66, 8_25))
    # defect 2: known platform but the fund-code line is missing
    with open(os.path.join(ROOT, "20240116", "haomai_shuhui_nocode_20240116.txt"), "w") as f:
        f.write(body("【好买基金】交易确认单", PRODUCTS[1], 0, "赎回", "确认金额",
                     "手续费", fmt_date("20240116", "cn"),
                     66_00_00, 44_00_00, 9_90, include_code=False))
    # the 17-platform extension only exists in the committed default
    # corpus; scale trees keep the v1 shape for comparability
    if N_DATES <= 0:
        write_new_platform_files()
    n = sum(len(fs) for _, _, fs in os.walk(ROOT))
    print(f"wrote {n} files under {ROOT}")


if __name__ == "__main__":
    main()

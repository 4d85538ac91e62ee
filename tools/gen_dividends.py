#!/usr/bin/env python3
"""Generate the deterministic DIVIDEND statement corpus under
data/dividends/.

Mirrors the reference's dividend front door
(/root/reference/extractors/dividend_extractor.py): its OWN
23-platform signature chain (:1301-1323 — no ¬转换 negations, no
walk-level exclusion algebra, jd keys on 肯特瑞基金-in-filename,
ningbo keys on 同业客户付款账户信息 with no ¬北极星), its per-platform
dividend labels (红利资金（元 / 红利总金额（元） / 红利转投份额 /
再投资份额 / 转投份额 / 红股 / 所得现金（元） / 分红金额+CNY ...),
the VALUE-COUPLED platforms where one extracted number feeds both
派送金额 and 派送份额 (xingzheng/changliang/pingan/jiaohang/jianhang/
tengyuan/wangjin/ronglianchuang/minsheng/ningbo/liantai/zdt-single/
guoxinjiali), next-line value placement (tiantian :87-96; the
strategy-A/B same-then-next fallback of hexun/wangjin/panying), the
jiaohang 红利截止日期 = 确认日期 minus one day (:445-458, every other
platform defaults to the run date minus one, :1436-1441), the
multi-record lists (yingmi 序号: blocks needing code∧amount∧shares,
:253-255; liantai 交易信息 blocks needing code∧shares with
amount=shares, :871-872), the zdt dual tabular row shapes with the
single-bill fallback (:917-1012), the guoxinjiali token-positional
row with the filename-derived product name (:1099-1160), and the
group-merge output (sum by 账套编号+基金市场代码, platforms joined
with 、 in first-seen order, :1460-1483).

Fully deterministic; filenames stay ASCII pinyin.
Run once from the repo root: python3 tools/gen_dividends.py
"""
import os
import sys

ROOT = sys.argv[1] if len(sys.argv) > 1 else \
    os.path.join(os.path.dirname(__file__), "..", "data", "dividends")

PRODUCTS = [
    "安鑫回报混合A", "稳健增利债券C", "创新成长股票", "货币增值宝B",
    "价值精选混合", "量化对冲多策略",
]


def money(cents):
    return f"{cents // 100:,}.{cents % 100:02d}"


# (date, filename, [lines]) — {product}/{code}/{amount}/{shares}
# substituted with deterministic formula values; literals stay literal
# for spec pinning.
FILES = [
    # ------------------------------------------------ 20240115 ------
    # haomai: 好买基金[:2]; distinct amount/shares labels
    ("20240115", "fenhong_hm_20240115.txt", [
        "【好买基金】分红确认单", "账户名称：{product}", "产品代码：{code}",
        "确认金额：{amount}", "确认份额：{shares}"]),
    # tiantian via content (天天基金 in lines[3:]); BOTH values on the
    # line AFTER their label (:87-96)
    ("20240115", "fenhong_tt_20240115.txt", [
        "基金分红确认对账单", "账户户名：{product}", "基金代码：{code}",
        "业务类型：分红", "天天基金网运营数据中心", "红利资金（元）",
        "{amount}", "红利再投资基金份额", "{shares}"]),
    # xingzheng: 兴证全球基金[:2]; spaced labels, VALUE-COUPLED on
    # 再投资份额
    ("20240115", "fenhong_xz_20240115.txt", [
        "兴证全球基金管理有限公司", "账 号 名 称：{product}",
        "基 金 代 码：{code}", "再投资份额：{shares}"]),
    # lide: 利得基金[3:]; distinct paren labels
    ("20240115", "lide_fenhong_20240115.txt", [
        "基金分红确认书", "投资者姓名/名称：{product}", "基金代码：{code}",
        "利得基金销售有限公司", "红利总金额（元）：{amount}",
        "红利再投份额（份）：{shares}"]),
    # changliang: 长量基金[:2]; coupled on 红利转投份额
    ("20240115", "changliang_fenhong_20240115.txt", [
        "长量基金分红确认数据", "投资者名称：{product}", "基金代码：{code}",
        "红利转投份额：{shares}"]),
    # yingmi MULTI-RECORD (序号: blocks): record 2 lacks 分红金额 →
    # dropped by the all-three validity rule (:253-255)
    ("20240115", "yingmi_fenhong_20240115.txt", [
        "盈米财富基金分红对账单", "投资者名称：{product}",
        "序号:1 基金代码:000111", "分红金额:1,200.00",
        "红利再投份额:1,000.00",
        "序号:2 基金代码:000222", "红利再投份额:500.00"]),
    # zhaoyingtong: 招赢通[:2]; amount value rides after CNY (:282-283)
    ("20240115", "zhaoyingtong_fenhong_20240115.txt", [
        "招赢通理财分红确认单", "投资者名称：{product}", "产品代码：{code}",
        "分红金额 CNY {amount}", "转投份额(份) {shares}"]),
    # youchu via filename; 再投资金额 + 红股
    ("20240115", "youchu_fenhong_20240115.txt", [
        "中国邮政储蓄银行基金分红确认单", "客户名称：{product}",
        "产品代码：{code}", "再投资金额：{amount}", "红股：{shares}"]),
    # pingan: 行E通[5:]; coupled on 确认份额(份) (half-width parens)
    ("20240115", "pa_fenhong_20240115.txt", [
        "平安银行股份有限公司", "基金分红确认通知书", "账户名称：{product}",
        "基金代码：{code}", "分红方式 红利再投资", "行E通交易平台",
        "确认份额(份)：{shares}"]),
    # jiaohang via filename; coupled on 转投份额 AND the 红利截止日期 =
    # 确认日期 - 1 day (:445-458)
    ("20240115", "jiaoetong_fenhong_20240115.txt", [
        "交通银行基金分红确认单", "投资者信息：{product}", "产品代码：{code}",
        "转投份额：{shares}", "确认日期：20240116"]),
    # hexun: 和讯信息科技有限公司[3:]; shares value on the NEXT line
    # (the strategy-B leg, :514-524)
    ("20240115", "hexun_fenhong_20240115.txt", [
        "基金分红电子对账单", "账户名称：{product}", "基金代码：{code}",
        "和讯信息科技有限公司", "红利资金(元)：{amount}",
        "红利再投资确认份额", "{shares}"]),
    # jianhang via filename; spaced 红 股, coupled
    ("20240115", "jianhang_fenhong_20240115.txt", [
        "基金红利发放确认通知", "客 户 名 称：{product}",
        "基 金 代 码：{code}", "红 股：{shares}"]),
    # tengyuan via filename; coupled on 红利再投份额
    ("20240115", "tengyuan_fenhong_20240115.txt", [
        "基金分红交易确认单", "客户名称：{product}", "基金代码：{code}",
        "红利再投份额：{shares}", "腾元基金销售有限公司"]),
    # wangjin via filename; coupled, strategy-A same-line leg
    ("20240115", "wangjin_fenhong_20240115.txt", [
        "基金分红业务确认通知", "客户名称：{product}", "基金代码：{code}",
        "红利再投份额：{shares}", "网金基金销售服务有限公司"]),
    # jd via content (肯特瑞[:2]); distinct 红利再投金额/红利再投份额
    ("20240115", "fenhong_jd_20240115.txt", [
        "京东肯特瑞基金销售有限公司", "红利再投确认回执", "客户名称：{product}",
        "基金代码：{code}", "红利再投金额：{amount}", "红利再投份额：{shares}"]),
    # ronglianchuang: 融联创[:2]; name=投资主体产品名称, coupled
    ("20240115", "ronglianchuang_fenhong_20240115.txt", [
        "融联创同业交易平台红利确认单", "投资主体产品名称：{product}",
        "基金代码：{code}", "再投资份额（份）：{shares}"]),
    # liantai MULTI-RECORD via filename 北极星: record 2 lacks 基金代码
    # → dropped by the code∧shares rule; amount = shares (:860-862)
    ("20240115", "beijixing_fenhong_20240115.txt", [
        "联泰基金销售平台红利确认单", "投资账户：{product}",
        "交易信息（1/2）", "基金代码：000444",
        "红利再投份额(份)：2,500.00",
        "交易信息（2/2）", "红利再投份额(份)：900.00"]),
    # minsheng via filename; coupled on 确认份额（份）
    ("20240115", "minshengtongye_fenhong_20240115.txt", [
        "基金红利再投确认通知书", "客户名称：{product}", "产品代码：{code}",
        "确认份额（份）：{shares}"]),
    # zdt TABULAR: one standard row (name between account and code) and
    # one compact row (linebreak ate the name), 红利再投资 as the
    # in-row marker (:939-979)
    ("20240115", "zhengdatong_fenhong_20240115.txt", [
        "证达通基金销售结算平台分红确认汇总单", "投资者名称：{product}",
        "序号 交易账号 基金名称 基金代码 分红方式 分红金额 分红份额 日期 状态",
        " 1 12345678901234 安鑫回报混合A 000888 红利再投资 1,154.93 1,100.00 20240115 成功",
        " 2 22345678901234 000999 红利再投资 2,309.86 2,200.00 20240115 成功"]),
    # jiyu: 基煜基金[:2]; distinct 再投资金额/再投资份额
    ("20240115", "jiyu_fenhong_20240115.txt", [
        "基煜基金销售有限公司分红确认单", "客户名称：{product}",
        "产品代码：{code}", "再投资金额：{amount}", "再投资份额：{shares}"]),
    # ningbo via content clause (同业客户付款账户信息 in lines[5:]);
    # coupled on 红利份额（份）
    ("20240115", "nb_fenhong_20240115.txt", [
        "基金红利发放确认通知书", "客户名称：{product}", "产品代码：{code}",
        "红利份额（份）：{shares}", "交易市场：国内银行间",
        "备注：红利再投资", "同业客户付款账户信息：已登记"]),
    # guoxinjiali: 国信嘉利基金[:2]; TOKEN-POSITIONAL row — code is the
    # 6-digit token before 分红, value is the 6th token after it, the
    # product name comes from the FILENAME prefix (:1099-1160)
    ("20240115", "wanlianzhenxuan3hao_jiaoyiquerendan_20240115.txt", [
        "国信嘉利基金销售结算专户", "交易确认单",
        "万联资管臻 2025122 富安达现金通货",
        "选3号FOF集 3 710501 币A 分红 - - - - 0.00 87.09 0.00"]),
    # panying via filename; 所得现金（元） same-line, 所得份额（份）
    # value on the NEXT line (strategy B, :1248-1257)
    ("20240115", "panying_fenhong_20240115.txt", [
        "攀赢基金电子分红确认单", "客户名称：{product}", "产品代码：{code}",
        "所得现金（元）：{amount}", "所得份额（份）",
        "{shares}份 红利再投资"]),
    # ------------------------------------------------ 20240116 ------
    # jd via its FILENAME clause (肯特瑞基金 → kenterijijin)
    ("20240116", "kenterijijin_fenhong_20240116.txt", [
        "红利再投业务回执", "确认成功", "客户名称：{product}",
        "基金代码：{code}", "红利再投金额：{amount}", "红利再投份额：{shares}"]),
    # zdt SINGLE-BILL fallback: no tabular rows anywhere → the label
    # path fires, amount = shares = 分红份额 (:984-1009)
    ("20240116", "zdt2_fenhong_20240116.txt", [
        "证达通基金单笔分红确认单", "投资者名称：{product}",
        "基金代码：001234", "分红份额：3,300.00"]),
    # MERGE exercise: same product (→ same 账套编号) and same fund code
    # on two different platforms — the merged output must sum the legs
    # and join the platforms 、-style in first-seen order (:1460-1483)
    ("20240116", "fenhong_hm_merge_20240116.txt", [
        "【好买基金】分红确认单", "账户名称：安鑫回报混合A", "产品代码：000777",
        "确认金额：600.00", "确认份额：500.00"]),
    ("20240116", "jiyu_merge_20240116.txt", [
        "基煜基金销售有限公司分红确认单", "客户名称：安鑫回报混合A",
        "产品代码：000777", "再投资金额：150.00", "再投资份额：125.00"]),
    # defect: unknown platform → UNKNOWN, valid=false (the reference
    # drops these silently, :1444 'continue'; the engine surfaces them)
    ("20240116", "weizhi_fenhong_20240116.txt", [
        "未知平台分红数据", "产品名称：{product}", "金额：{amount}"]),
]


def main():
    for j, (d, name, lines) in enumerate(FILES):
        amount_c = 50_00_00 + j * 27_18_28   # deterministic cents
        shares_c = amount_c * 5 // 6
        code = 300 + (j * 19) % 200
        body = "\n".join(lines).format(
            product=PRODUCTS[j % len(PRODUCTS)],
            code=f"{code:06d}",
            amount=money(amount_c),
            shares=money(shares_c)) + "\n"
        folder = os.path.join(ROOT, d)
        os.makedirs(folder, exist_ok=True)
        with open(os.path.join(folder, name), "w") as f:
            f.write(body)
    n = sum(len(fs) for _, _, fs in os.walk(ROOT))
    print(f"wrote {n} files under {ROOT}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Generate the deterministic PURCHASE-APPLY statement corpus under
data/applies/.

Mirrors the reference's fourth front door
(/root/reference/extractors/purchase_extractor.py — the 申购申请
walk): its OWN 20-platform signature chain (:988-1015 — note
ronglianchuang scopes 融联创 in lines[8:], ningbo carries the full
宁波∧¬北极星 / 宁波银行[15:]∧¬联泰[:5] negative conjunction, and zdt
is a DISJUNCTION of two multi-literal conjunctions: 证达通 ∧ the
'赎回交易（合计0笔，共计0.00份）' marker ∧ ¬超级, OR 证达通 ∧
申购受理单), exactly ONE money field per record (申购金额 — the
apply master has no shares/fee, :1083-1100), the per-platform amount
labels (申请金额小写 / 申请金额（元） / 申请金额/份额 /
申购金额（小写） / 委托金额/委托份额 / CNY / 申请金额(元) ...), the
wangjin same-then-next amount fallback (:338-409), the walk-level
filename exclusions (赎回/超级/转换/分红方式/分红设置/失效,
:971-973), the multi-record lists (yingmi 交易类型-申购 blocks,
liantai 交易信息 blocks, both code∧amount validity), and zdt's two
formats — the single 申购受理单 label path and the 汇总 CODE-ANCHOR
rows where each 6-digit code anchors a record whose amount is on the
same line or at the start of the next (:880-946).

Fully deterministic; filenames stay ASCII pinyin.
Run once from the repo root: python3 tools/gen_applies.py
"""
import os
import sys

ROOT = sys.argv[1] if len(sys.argv) > 1 else \
    os.path.join(os.path.dirname(__file__), "..", "data", "applies")

PRODUCTS = [
    "安鑫回报混合A", "稳健增利债券C", "创新成长股票", "货币增值宝B",
    "价值精选混合", "量化对冲多策略",
]


def money(cents):
    return f"{cents // 100:,}.{cents % 100:02d}"


FILES = [
    # ------------------------------------------------ 20240115 ------
    ("20240115", "shengou_hm_20240115.txt", [
        "【好买基金】申购受理回执", "账户名称：{product}", "产品代码：{code}",
        "申请金额小写：{amount}"]),
    ("20240115", "shengou_tt_20240115.txt", [
        "基金申购申请对账单", "账户户名：{product}", "基金代码：{code}",
        "业务类型：申购申请", "天天基金网运营数据中心", "申请金额：{amount}"]),
    ("20240115", "lide_shengou_20240115.txt", [
        "基金申购申请书", "投资者姓名/名称：{product}", "基金代码：{code}",
        "利得基金销售有限公司", "申请金额（元）：{amount}"]),
    ("20240115", "changliang_shengou_20240115.txt", [
        "长量基金申购申请数据", "投资者名称：{product}", "基金代码：{code}",
        "申请金额：{amount}"]),
    # pingan: 行E通 in lines[5:]
    ("20240115", "pa_shengou_20240115.txt", [
        "平安银行股份有限公司", "基金申购申请通知书", "账户名称：{product}",
        "基金代码：{code}", "申购业务受理", "行E通交易平台",
        "申请金额：{amount}"]),
    # jiaohang: the slash label 申请金额/份额
    ("20240115", "jiaoetong_shengou_20240115.txt", [
        "交通银行基金申购受理单", "投资者信息：{product}", "产品代码：{code}",
        "申请金额/份额：{amount}"]),
    # wangjin: same-line leg of the same-then-next amount fallback
    ("20240115", "wangjin_shengou_20240115.txt", [
        "基金申购业务受理通知", "投资者名称：{product}", "基金代码：{code}",
        "申购金额（小写）：{amount}", "网金基金销售服务有限公司"]),
    ("20240115", "tengyuan_shengou_20240115.txt", [
        "基金申购受理确认单", "投资者名称：{product}", "基金代码：{code}",
        "申购金额（小写）：{amount}", "腾元基金销售有限公司"]),
    # hexun: 和讯信息科技有限公司 in lines[3:]
    ("20240115", "hexun_shengou_20240115.txt", [
        "基金申购电子对账单", "账户名称：{product}", "基金代码：{code}",
        "和讯信息科技有限公司", "申请金额：{amount}"]),
    # jd: half-width 申请金额(元)
    ("20240115", "kenterijijin_shengou_20240115.txt", [
        "申购申请业务回执", "受理成功", "客户名称：{product}",
        "基金代码：{code}", "申请金额(元)：{amount}"]),
    # minsheng: the slash label 委托金额/委托份额
    ("20240115", "minshengtongye_shengou_20240115.txt", [
        "基金申购委托通知书", "客户名称：{product}", "产品代码：{code}",
        "委托金额/委托份额：{amount}"]),
    # zhaoyingtong: amount after CNY
    ("20240115", "zhaoyingtong_shengou_20240115.txt", [
        "招赢通理财申购申请单", "投资者名称：{product}", "产品代码：{code}",
        "申请金额 CNY {amount}"]),
    # ronglianchuang: 融联创 first appears at line 8 (lines[8:] scope)
    ("20240115", "rlc_shengou_20240115.txt", [
        "同业平台申购申请单", "投资者名称：{product}", "基金代码：{code}",
        "申请金额：{amount}", "受理状态：成功", "风险提示：基金投资需谨慎",
        "第一页 共一页", "客服热线：95888",
        "融联创同业交易平台受理专用章"]),
    # jiyu: paren-colon 申购金额(小写)：
    ("20240115", "jiyu_shengou_20240115.txt", [
        "基煜基金销售有限公司申购受理单", "账户名称：{product}",
        "产品代码：{code}", "申购金额（小写）：{amount}"]),
    # ningbo via FILENAME (宁波 ∧ ¬北极星)
    ("20240115", "ningbo_shengou_20240115.txt", [
        "基金申购申请确认书", "客户名称：{product}", "产品代码：{code}",
        "申请金额（元）：{amount}"]),
    # guoxinjiali: a NORMAL label platform in this chain (no token row)
    ("20240115", "gxjl_shengou_20240115.txt", [
        "国信嘉利基金销售有限公司", "账户名称：{product}", "产品代码：{code}",
        "申请金额：{amount}"]),
    ("20240115", "panying_shengou_20240115.txt", [
        "攀赢基金电子申购申请单", "客户名称：{product}", "产品代码：{code}",
        "申购金额（小写）：{amount}"]),
    # yingmi MULTI-RECORD (交易类型-申购 blocks): record 2 lacks
    # 申请金额 → dropped by the code∧amount rule (:236-238)
    ("20240115", "yingmi_shengou_20240115.txt", [
        "盈米财富基金申购对账单", "投资者名称：{product}",
        "交易类型：申购 交易序号：1", "基金代码：000111",
        "申请金额：30,000.00",
        "交易类型：申购 交易序号：2", "基金代码：000222",
        "受理状态：已受理"]),
    # liantai MULTI-RECORD via filename 北极星: record 2 lacks 基金代码
    # → dropped (:712-714); half-width 申请金额(元)
    ("20240115", "beijixing_shengou_20240115.txt", [
        "联泰基金销售平台申购申请单", "投资账户：{product}",
        "交易信息（1/2）", "基金代码：000444", "申请金额(元)：12,000.00",
        "交易信息（2/2）", "申请金额(元)：7,000.00"]),
    # zdt SINGLE mode: 申购受理单 in lines[:2], label extraction
    ("20240115", "zdt_shengou_20240115.txt", [
        "证达通基金申购受理单", "投资者名称：{product}",
        "基金代码：583101", "申购金额（小写）：60,000,000.00元"]),
    # ------------------------------------------------ 20240116 ------
    # zdt 汇总 (code-anchor) mode: the 赎回交易（合计0笔 marker + ¬超级;
    # record 1's amount is on the SAME line after the code, record 2's
    # amount is at the START OF THE NEXT line (:926-941)
    ("20240116", "zdt_huizong_shengou_20240116.txt", [
        "证达通基金申购汇总单", "投资者名称：{product}",
        "赎回交易（合计0笔，共计0.00份）",
        "申购 583201 金额 45,000.00 受理成功",
        "申购 583202 金额", "66,500.00 受理成功"]),
    # the ¬超级 negation: same marker literal but a 超级 line kicks it
    # out of zdt's first conjunction; no 申购受理单 either → UNKNOWN
    ("20240116", "zdt_chaoji_shengou_20240116.txt", [
        "证达通基金超级转换汇总单", "投资者名称：{product}",
        "赎回交易（合计0笔，共计0.00份）",
        "申购 583301 金额 1,000.00"]),
    # ningbo via the CONTENT clause: 宁波银行 at line 15, no 联泰[:5]
    ("20240116", "stmt_nb_shengou_20240116.txt", [
        "基金申购申请确认书", "客户名称：{product}", "产品代码：{code}",
        "申请金额（元）：{amount}", "受理状态：成功",
        "风险提示：基金投资需谨慎", "第一页 共一页", "客服热线：95574",
        "本页以下无正文", "——", "——", "——", "——", "——", "——",
        "宁波银行股份有限公司代理销售"]),
    # the negative conjunction: 宁波 AND 北极星 in the filename → ningbo
    # blocked, 北极星 routes it to liantai
    ("20240116", "ningbobeijixing_shengou_20240116.txt", [
        "联泰基金销售平台申购申请单", "投资账户：{product}",
        "交易信息（1/1）", "基金代码：000555", "申请金额(元)：9,000.00"]),
    # wangjin NEXT-LINE amount leg (:399-406)
    ("20240116", "wangjin2_shengou_20240116.txt", [
        "基金申购业务受理通知", "投资者名称：{product}", "基金代码：{code}",
        "申购金额（小写）", "{amount}", "网金基金销售服务有限公司"]),
    # tiantian via FILENAME
    ("20240116", "tiantian_shengou_20240116.txt", [
        "基金申购申请对账单", "账户户名：{product}", "基金代码：{code}",
        "申请金额：{amount}"]),
    # --- walk-level filename exclusions (:971-973) ------------------
    ("20240116", "haomai_shuhui_20240116.txt", [
        "【好买基金】申购受理回执", "账户名称：{product}", "产品代码：{code}",
        "申请金额小写：{amount}"]),
    ("20240116", "pa_chaojizhuanhuan_20240116.txt", [
        "平安银行股份有限公司", "基金申购申请通知书", "账户名称：{product}",
        "基金代码：{code}", "申购业务受理", "行E通交易平台",
        "申请金额：{amount}"]),
    ("20240116", "tt_fenhongshezhi_20240116.txt", [
        "基金申购申请对账单", "账户户名：{product}", "基金代码：{code}",
        "业务类型：申购申请", "天天基金网运营数据中心", "申请金额：{amount}"]),
    ("20240116", "lide_shixiao_20240116.txt", [
        "基金申购申请书", "投资者姓名/名称：{product}", "基金代码：{code}",
        "利得基金销售有限公司", "申请金额（元）：{amount}"]),
    # defect: unknown platform
    ("20240116", "weizhi_shengou_20240116.txt", [
        "未知平台申购数据", "产品名称：{product}", "金额：{amount}"]),
]


def main():
    for j, (d, name, lines) in enumerate(FILES):
        amount_c = 70_00_00 + j * 16_18_03   # deterministic cents
        code = 400 + (j * 23) % 100
        body = "\n".join(lines).format(
            product=PRODUCTS[j % len(PRODUCTS)],
            code=f"{code:06d}",
            amount=money(amount_c)) + "\n"
        folder = os.path.join(ROOT, d)
        os.makedirs(folder, exist_ok=True)
        with open(os.path.join(folder, name), "w") as f:
            f.write(body)
    n = sum(len(fs) for _, _, fs in os.walk(ROOT))
    print(f"wrote {n} files under {ROOT}")


if __name__ == "__main__":
    main()

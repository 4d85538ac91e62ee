#!/usr/bin/env python3
"""Generate the deterministic REDEMPTION statement corpus under
data/redemptions/.

Mirrors the reference's redemption front door
(/root/reference/extractors/redemption_extractor.py): its OWN
17-platform signature chain (:1223-1290 — note is_jd keys on 赎回确认
where the confirm chain keys on 申购确认, is_liantai/is_ronglianchuang
key on 赎回 scopes), its OWN per-platform field labels (:35-1160 —
账户名称/账户户名/投资者信息/来款账号名称/..., 赎回手续费/确认费用/
费开户, 赎回份额), its five DATE MODES (yyyy-MM-dd hyphen-strip,
plain 8-digit, date-on-NEXT-line, T+n arithmetic from the run date,
and no-date-in-file → run-date default), its fee defaults ('0.00'
for wangjin/panying/liantai), its walk-level exclusion algebra
(强行调/调增/分红方式 skipped; 申购-in-filename skipped UNLESS
江苏银行/融联创 — the mirror image of the confirm chain's 赎回 rule,
:1195-1203), the multi-record platforms (yingmi 交易序号 blocks,
liantai 交易信息 blocks, tengyuan 业务类型：赎回确认 blocks, each with
its own record-validity rule), the zdt positional summary TABLE
(compact and standard row shapes, :1091-1160), and the jd
super-conversion forced-redemption SECTION (强行赎回确认 scoping,
:379-462).

Fully deterministic — no randomness, no timestamps — so the corpus is
committed and oracled byte-for-byte. Filenames stay ASCII pinyin
(byte-stable across URI-encoding path layers); each token stands for
the reference's Chinese filename keyword (jiangsuyinhang = 江苏银行,
beijixing = 北极星, minshengtongye = 民生同业e+, ...).

Run once from the repo root: python3 tools/gen_redemptions.py
"""
import os
import sys

ROOT = sys.argv[1] if len(sys.argv) > 1 else \
    os.path.join(os.path.dirname(__file__), "..", "data", "redemptions")

PRODUCTS = [
    "安鑫回报混合A", "稳健增利债券C", "创新成长股票", "货币增值宝B",
    "价值精选混合", "量化对冲多策略",
]


def money(cents):
    return f"{cents // 100:,}.{cents % 100:02d}"


# (date, filename, [lines]) — {product}/{code}/{amount}/{shares}/{fee}
# substituted per file with deterministic formula values; literal
# values stay literal so specs can pin them.
FILES = [
    # ------------------------------------------------ 20240115 ------
    # haomai: 好买基金 in lines[:2] ∧ ¬转换; name=账户名称 code=产品代码
    # date=预计到账日 (hyphen mode, 2024-01-18 → 20240118)
    ("20240115", "queren_shuhui_hm_20240115.txt", [
        "【好买基金】赎回交易确认单", "账户名称：{product}", "产品代码：{code}",
        "确认金额：{amount}", "确认份额：{shares}", "手续费：{fee}",
        "预计到账日：2024-01-18"]),
    # tiantian via content clause (天天基金 in lines[3:], ¬转换);
    # name=账户户名 fee=确认费用; date mode NEXT LINE (预计赎回到账 ↵ \d{8})
    ("20240115", "queren_shuhui_tt_20240115.txt", [
        "基金赎回确认对账单", "账户户名：{product}", "基金代码：{code}",
        "业务类型：赎回", "天天基金网运营数据中心", "确认金额：{amount}",
        "确认份额：{shares}", "确认费用：{fee}", "预计赎回到账",
        "20240118起可查询"]),
    # lide: 利得基金 in lines[3:]; paren labels; date=预计到账日期 hyphen,
    # fallback EMPTY (reference :158-165)
    ("20240115", "lide_shuhui_20240115.txt", [
        "基金赎回确认书", "投资者姓名/名称：{product}", "基金代码：{code}",
        "利得基金销售有限公司", "确认金额（元）：{amount}",
        "确认份额（份）：{shares}", "交易费用（元）：{fee}",
        "预计到账日期：2024-01-19"]),
    # changliang: 长量基金 in lines[:2]; date=预计赎回款到账日 plain-8
    ("20240115", "changliang_shuhui_20240115.txt", [
        "长量基金赎回确认数据", "投资者名称：{product}", "基金代码：{code}",
        "确认金额：{amount}", "确认份额：{shares}", "手续费：{fee}",
        "预计赎回款到账日：20240118"]),
    # jiaohang via filename 交e通; fee=赎回手续费 date=确认日期 plain-8
    ("20240115", "jiaoetong_shuhui_20240115.txt", [
        "基金赎回交易确认通知单", "投资者信息：{product}", "产品代码：{code}",
        "确认金额：{amount}", "确认份额：{shares}", "赎回手续费：{fee}",
        "确认日期：20240115"]),
    # jd: 肯特瑞 ∧ 赎回确认, both in lines[:2] (the confirm chain keys
    # on 申购确认 here — the biz-specific signature variance)
    ("20240115", "kenteri_shuhuiqueren_20240115.txt", [
        "京东肯特瑞基金销售有限公司", "赎回确认回执", "客户名称：{product}",
        "基金代码：{code}", "确认金额：{amount}", "确认份额：{shares}",
        "手续费：{fee}", "预计到账日：2024-01-17"]),
    # wangjin via filename; shares=赎回份额 fee=费开户 ABSENT → 0.00
    # default (:585-598), no date in file → run-date default
    ("20240115", "wangjin_shuhui_20240115.txt", [
        "基金赎回业务确认通知", "投资者名称：{product}", "基金代码：{code}",
        "确认金额：{amount}", "赎回份额：{shares}",
        "网金基金销售服务有限公司"]),
    # pingan: 行E通 in lines[5:]; date=赎回最快到账日 T+3 →
    # batch 20240115 + (3-1) = 20240117 (:663-686)
    ("20240115", "pa_shuhui_20240115.txt", [
        "平安银行股份有限公司", "基金赎回确认通知书", "账户名称：{product}",
        "基金代码：{code}", "确认金额：{amount}", "确认份额：{shares}",
        "行E通交易平台", "手续费：{fee}", "赎回最快到账日：T+3"]),
    # jianhang via filename; spaced labels; no date → run-date default
    ("20240115", "jianhang_shuhui_20240115.txt", [
        "基金份额赎回确认通知", "客 户 名 称：{product}",
        "基 金 代 码：{code}", "确 认 金 额：{amount}",
        "确 认 份 额：{shares}", "手 续 费：{fee}"]),
    # ronglianchuang via content clause (融联创 in lines[:2] ∧ 赎回 in
    # lines[:5]); name=来款账号名称; no date → run-date default
    ("20240115", "ronglianchuang_shuhui_20240115.txt", [
        "融联创同业交易平台赎回确认单", "来款账号名称：{product}",
        "产品代码：{code}", "确认金额：{amount}", "确认份额：{shares}",
        "手续费：{fee}"]),
    # minsheng via filename; paren-colon labels; no date → default
    ("20240115", "minshengtongye_shuhui_20240115.txt", [
        "基金赎回确认通知书", "客户名称：{product}", "产品代码：{code}",
        "确认金额（元）：{amount}", "确认份额（份）：{shares}",
        "手续费（元）：{fee}"]),
    # panying via filename; fee line ABSENT → 0.00 default (:1085-1087)
    ("20240115", "panying_shuhui_20240115.txt", [
        "攀赢基金电子赎回确认单", "客户名称：{product}", "产品代码：{code}",
        "确认金额：{amount}", "确认份额：{shares}"]),
    # yingmi MULTI-RECORD (交易序号 blocks): record 2 lacks amount AND
    # shares → dropped by the code-and-(amount-or-shares) validity rule
    # (:296-300); record 3 is shares-only → KEPT (pins the or-leg)
    ("20240115", "yingmi_shuhui_20240115.txt", [
        "盈米财富基金赎回对账单", "投资者名称：{product}",
        "交易序号：1 交易类型：赎回", "基金代码：000111",
        "确认金额：10,000.00", "确认份额：8,000.00", "手续费：5.00",
        "到账日期：2024-01-18",
        "交易序号：2 交易类型：赎回", "基金代码：000222", "手续费：3.00",
        "交易序号：3 交易类型：赎回", "基金代码：000333",
        "确认份额：2,000.00"]),
    # liantai MULTI-RECORD via filename 北极星 (+ 赎回 in lines[:15]):
    # record 2 lacks 基金代码, record 3 lacks 确认金额 — BOTH dropped by
    # liantai's stricter code-AND-amount rule (:919-920; contrast with
    # yingmi's or-rule). fee default 0.00 (:849)
    ("20240115", "beijixing_shuhui_20240115.txt", [
        "联泰基金销售平台赎回确认单", "投资账户：{product}",
        "交易信息（1/3）", "基金代码：000444", "确认金额（元）：20,000.00",
        "确认份额（份）：15,000.00", "手续费（元）：30.00",
        "预计到账日期：2024-01-19",
        "交易信息（2/3）", "确认金额（元）：5,000.00",
        "确认份额（份）：4,000.00",
        "交易信息（3/3）", "基金代码：000555", "确认份额（份）：3,000.00"]),
    # tengyuan MULTI-RECORD via filename (业务类型：赎回确认 marks each
    # record, :795-800); code-only validity (:833) so the amount-less
    # second record is KEPT; no per-record date → run-date default
    ("20240115", "tengyuan_shuhui_20240115.txt", [
        "基金赎回交易确认单", "客户名称：{product}",
        "业务类型：赎回确认", "基金代码：000666", "确认金额：7,000.00",
        "确认份额：6,000.00", "手续费：2.00",
        "业务类型：赎回确认", "基金代码：000777",
        "腾元基金销售有限公司"]),
    # zdt positional summary TABLE (证达通 ∧ 赎回确认 anywhere): one
    # header line, two STANDARD rows (name between account and code),
    # one COMPACT row (PDF linebreak ate the name — account directly
    # followed by code, :1103-1130); 序号 gaps are real
    ("20240115", "zhengdatong_shuhui_20240115.txt", [
        "证达通基金销售结算平台赎回确认汇总单", "投资者名称：{product}",
        "序号 交易账号 基金名称 基金代码 赎回份额 确认份额 确认金额 手续费 净值 日期 状态",
        " 1 12345678901234 安鑫回报混合A 000888 1,000.00 900.00 8,910.00 1.50 1.0000 20240115 成功",
        " 2 22345678901234 000999 2,000.00 1,800.00 17,820.00 3.00 1.0000 20240115 成功",
        " 3 32345678901234 稳健增利债券C 001111 5,000.00 4,500.00 44,550.00 7.50 1.0000 20240115 成功"]),
    # jd super-conversion forced redemption: 肯特瑞 ∧ 转换 in filename;
    # extraction is SECTION-SCOPED to 强行赎回确认 (:388-395) — the
    # decoy 客户名称 line BEFORE the marker must be ignored
    ("20240115", "kenteri_chaojizhuanhuan_20240115.txt", [
        "京东肯特瑞超级转换确认单", "转换业务回执", "客户名称：不应提取的转出方",
        "基金代码：999999", "转出确认金额：1.00",
        "强行赎回确认 确认成功", "客户名称：{product}", "基金代码：{code}",
        "确认金额：{amount}", "确认份额：{shares}", "手续费：{fee}",
        "预计到账日：2024-01-18"]),
    # ------------------------------------------------ 20240116 ------
    # haomai with NO date line → run-date default (:70-72 est_date =
    # today_str) — pins the hyphen-mode today-fallback
    ("20240116", "queren_shuhui_hm2_20240116.txt", [
        "【好买基金】赎回交易确认单", "账户名称：{product}", "产品代码：{code}",
        "确认金额：{amount}", "确认份额：{shares}", "手续费：{fee}"]),
    # tiantian via FILENAME clause, no 预计赎回到账 line → run-date
    ("20240116", "tiantian_shuhui_20240116.txt", [
        "基金赎回确认对账单", "账户户名：{product}", "基金代码：{code}",
        "确认金额：{amount}", "确认份额：{shares}", "确认费用：{fee}"]),
    # jd with NO date line → EMPTY fallback (:254 est_date = '') —
    # pins the per-platform fallback variance against haomai
    ("20240116", "kenteri_shuhuiqueren2_20240116.txt", [
        "京东肯特瑞基金销售有限公司", "赎回确认回执", "客户名称：{product}",
        "基金代码：{code}", "确认金额：{amount}", "确认份额：{shares}",
        "手续费：{fee}"]),
    # pingan DIRECT-DATE leg of the tplus mode (:676-681)
    ("20240116", "pa2_shuhui_20240116.txt", [
        "平安银行股份有限公司", "基金赎回确认通知书", "账户名称：{product}",
        "基金代码：{code}", "确认金额：{amount}", "确认份额：{shares}",
        "行E通交易平台", "手续费：{fee}", "赎回最快到账日：2024-01-20"]),
    # pingan with NO date line → run-date default (:684-686)
    ("20240116", "pa3_shuhui_20240116.txt", [
        "平安银行股份有限公司", "基金赎回确认通知书", "账户名称：{product}",
        "基金代码：{code}", "确认金额：{amount}", "确认份额：{shares}",
        "行E通交易平台", "手续费：{fee}"]),
    # jiaohang via CONTENT clause (交通银行 in lines[:2])
    ("20240116", "jtyh_shuhui_20240116.txt", [
        "交通银行基金赎回确认单", "投资者信息：{product}", "产品代码：{code}",
        "确认金额：{amount}", "确认份额：{shares}", "赎回手续费：{fee}",
        "确认日期：20240116"]),
    # minsheng via CONTENT clause (同业e+ in lines[2:])
    ("20240116", "ms2_shuhui_20240116.txt", [
        "基金赎回确认通知书", "客户名称：{product}", "民生银行同业e+交易平台",
        "产品代码：{code}", "确认金额（元）：{amount}",
        "确认份额（份）：{shares}", "手续费（元）：{fee}"]),
    # wangjin WITH its 费开户 fee line present (the OCR-garble label the
    # reference matches alongside 手续费, :589-594)
    ("20240116", "wangjin2_shuhui_20240116.txt", [
        "基金赎回业务确认通知", "投资者名称：{product}", "基金代码：{code}",
        "确认金额：{amount}", "赎回份额：{shares}", "费开户：{fee}",
        "网金基金销售服务有限公司"]),
    # yingmi second multi-record file: both records valid (amount-only
    # and amount+shares legs)
    ("20240116", "yingmi2_shuhui_20240116.txt", [
        "盈米财富基金赎回对账单", "投资者名称：{product}",
        "交易序号：1 交易类型：赎回", "基金代码：000123",
        "确认金额：6,000.00", "手续费：2.40", "到账日期：2024-01-19",
        "交易序号：2 交易类型：赎回", "基金代码：000456",
        "确认金额：9,000.00", "确认份额：7,200.00", "手续费：3.60"]),
    # jd_conversion file WITHOUT the 强行赎回确认 marker → every field
    # empty (:391-395 returns empties), valid=false
    ("20240116", "kenteri_chaojizhuanhuan2_20240116.txt", [
        "京东肯特瑞超级转换确认单", "转换业务回执", "客户名称：不应提取的转出方",
        "基金代码：999999", "转出确认金额：1.00"]),
    # --- exclusion classes: the walk skips these (:1191-1203); the
    # engine surfaces them as EXCL_* routed rows
    ("20240116", "queren_qiangxingtiao_hm_20240116.txt", [
        "【好买基金】赎回交易确认单", "账户名称：{product}", "产品代码：{code}",
        "确认金额：{amount}", "确认份额：{shares}", "手续费：{fee}",
        "预计到账日：2024-01-18"]),
    ("20240116", "changliang_tiaozeng_20240116.txt", [
        "长量基金赎回确认数据", "投资者名称：{product}", "基金代码：{code}",
        "确认金额：{amount}", "确认份额：{shares}", "手续费：{fee}",
        "预计赎回款到账日：20240119"]),
    ("20240116", "panying_fenhongfangshi_20240116.txt", [
        "攀赢基金电子赎回确认单", "客户名称：{product}", "产品代码：{code}",
        "确认金额：{amount}", "确认份额：{shares}"]),
    # 申购-in-filename KEPT for 江苏银行 (the exception mirror of the
    # confirm chain's 赎回 rule, :1199-1203) — classifies
    # ronglianchuang via its filename clause (+ 赎回 in lines[:5])
    ("20240116", "jiangsuyinhang_shengou_20240116.txt", [
        "江苏银行同业平台确认单", "赎回业务确认", "来款账号名称：{product}",
        "产品代码：{code}", "确认金额：{amount}", "确认份额：{shares}",
        "手续费：{fee}"]),
    # 申购-in-filename WITHOUT the exception → excluded from the
    # redemption run (EXCL_SUB)
    ("20240116", "lide_shengou_20240116.txt", [
        "基金申购确认书", "投资者姓名/名称：{product}", "基金代码：{code}",
        "利得基金销售有限公司", "确认金额（元）：{amount}",
        "确认份额（份）：{shares}", "交易费用（元）：{fee}",
        "预计到账日期：2024-01-19"]),
    # defect: unknown platform → UNKNOWN, valid=false
    ("20240116", "weizhi_shuhui_20240116.txt", [
        "未知平台赎回数据", "产品名称：{product}", "基金编号：ABC123",
        "金额：{amount}"]),
]


def main():
    for j, (d, name, lines) in enumerate(FILES):
        amount_c = 80_00_00 + j * 31_41_59   # deterministic cents
        shares_c = amount_c * 4 // 5
        fee_c = amount_c * 11 // 10000
        code = 200 + (j * 17) % 300
        body = "\n".join(lines).format(
            product=PRODUCTS[j % len(PRODUCTS)],
            code=f"{code:06d}",
            amount=money(amount_c),
            shares=money(shares_c),
            fee=money(fee_c)) + "\n"
        folder = os.path.join(ROOT, d)
        os.makedirs(folder, exist_ok=True)
        with open(os.path.join(folder, name), "w") as f:
            f.write(body)
    n = sum(len(fs) for _, _, fs in os.walk(ROOT))
    print(f"wrote {n} files under {ROOT}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Generate the deterministic CONVERSION (超级转换) statement corpus
under data/conversions/.

Mirrors the reference's conversion front door
(/root/reference/extractors/conversion_extractor.py): the walk's
INCLUSION filter (only files whose name carries 超级 or 转换 enter the
run, :126), its OWN product dict (product_codes_conversion.json,
:27-40), the two-platform chain (jd: 肯特瑞基金-in-filename OR
肯特瑞 in lines[:2]; tiantian: 天天基金-in-filename ONLY, :143-144),
jd's paired out/in label set (转出基金代码/转出基金确认金额/
转出基金确认份额/转入基金代码/转入基金确认金额/转入基金确认份额/
转换手续费, :46-135), and tiantian's positional format — the
out-leg VALUE PAIR on the line after the bare 转出基金确认 label
(shares then amount, :163-169), the in-leg single value after
转入基金确认 (:208-213), the dual fee strategies (same-line money, or
the money-before-a-paren on the PREVIOUS line, :180-204), the
万联-anchored two-line product name (:141-154), and the DERIVED
转入金额 = 转出金额 - 手续费 (:215-221).

Fully deterministic; filenames stay ASCII pinyin.
Run once from the repo root: python3 tools/gen_conversions.py
"""
import os
import sys

ROOT = sys.argv[1] if len(sys.argv) > 1 else \
    os.path.join(os.path.dirname(__file__), "..", "data", "conversions")

FILES = [
    # jd via FILENAME (肯特瑞基金 → kenterijijin); full label set
    ("20240115", "kenterijijin_chaojizhuanhuan_20240115.txt", [
        "超级转换业务确认单", "确认成功", "客户名称 安鑫回报混合A",
        "转出基金代码 100001", "转出基金确认金额 50,000.00",
        "转出基金确认份额 40,000.00", "转入基金代码 100002",
        "转入基金确认金额 49,970.00", "转入基金确认份额 39,500.00",
        "转换手续费 30.00"]),
    # jd via CONTENT clause (肯特瑞 in lines[:2])
    ("20240115", "stmt_chaojizhuanhuan_jd2_20240115.txt", [
        "京东肯特瑞超级转换确认单", "客户名称 稳健增利债券C",
        "转出基金代码 100003", "转出基金确认金额 20,000.00",
        "转出基金确认份额 16,000.00", "转入基金代码 100004",
        "转入基金确认金额 19,985.00", "转入基金确认份额 15,800.00",
        "转换手续费 15.00"]),
    # tiantian: positional format — out-leg pair on the next line
    # (shares first, then amount), in-leg single value, fee strategy A
    # (money on the 手续费 line), 万联 two-line name
    ("20240115", "tiantian_zhuanhuan_20240115.txt", [
        "天天基金超级转换确认单", "万联稳健配置混合", "计划A期",
        "转出基金代码 200001", "转出基金确认",
        "30,000.00 36,000.00", "转入基金代码 200002",
        "转换手续费 20.00", "转入基金确认", "28,800.00"]),
    # tiantian fee strategy B: the fee rides the line BEFORE the
    # 手续费 line as 'money(' (:196-204)
    ("20240116", "tiantian_chaoji_20240116.txt", [
        "天天基金超级转换确认单", "万联价值精选混合", "计划B期",
        "转出基金代码 200003", "转出基金确认",
        "10,000.00 12,000.00", "转入基金代码 200004",
        "719.97(转换费：0,补差费", "手续费 转入方收取", "转入基金确认",
        "9,600.00"]),
    # walk filter: a conversion-shaped file WITHOUT 超级/转换 in its
    # name never enters the reference run → EXCL_NOT_CONV here
    ("20240116", "kenterijijin_queren_20240116.txt", [
        "超级转换业务确认单", "客户名称 货币增值宝B",
        "转出基金代码 100005", "转出基金确认金额 5,000.00",
        "转出基金确认份额 4,000.00", "转入基金代码 100006",
        "转入基金确认金额 4,995.00", "转入基金确认份额 3,950.00",
        "转换手续费 5.00"]),
    # defect: neither platform → UNKNOWN
    ("20240116", "weizhi_zhuanhuan_20240116.txt", [
        "未知平台超级转换数据", "客户名称 创新成长股票",
        "转出基金代码 100007"]),
]


def main():
    for d, name, lines in FILES:
        folder = os.path.join(ROOT, d)
        os.makedirs(folder, exist_ok=True)
        with open(os.path.join(folder, name), "w") as f:
            f.write("\n".join(lines) + "\n")
    n = sum(len(fs) for _, _, fs in os.walk(ROOT))
    print(f"wrote {n} files under {ROOT}")


if __name__ == "__main__":
    main()

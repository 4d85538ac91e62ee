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
    n = sum(len(fs) for _, _, fs in os.walk(ROOT))
    print(f"wrote {n} files under {ROOT}")


if __name__ == "__main__":
    main()

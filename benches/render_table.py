#!/usr/bin/env python
"""Render a suite JSONL (benches/suite.py output) as the BENCHMARKS.md
lead-table markdown.  Parenthesizes vs_copy for rows whose working set is
too small for a meaningful same-session ceiling (the doc's footnote).

Usage: python benches/render_table.py benches/logs/r5/suite_r5c.jsonl
"""

import json
import sys

# rows whose min-traffic working set is < ~10 MB: the copy probe is
# overhead-dominated there (docs/BENCHMARKS.md footnote)
SMALL_WS = {"c2c_1d_1024_b1", "c2c_1d_256_b4096", "c2c_2d_1024x1024_b1",
            "c2c_1d_2310_b512", "dct2_8x8_b16384", "dst2_8x8_b16384",
            "dct2_512sq_b8", "fftconv_preset_256_b4_64to128",
            "fftconv_3d_16x8x4_b2_k3"}
HEADLINE = {"c2c_1d_1024_b4096"}


def main(path):
    print("| config | ms | eff GB/s | %roof | vs_copy | route |")
    print("|---|---|---|---|---|---|")
    for line in open(path):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        r = json.loads(line)
        name = r["bench"]
        if "error" in r:
            print(f"| {name} | — | — | — | — | ERROR: {r['error'][:60]} |")
            continue
        vs = r.get("vs_copy", 0.0)
        vs_s = f"({vs:.2f})*" if name in SMALL_WS else f"{vs:.2f}"
        bold = "**" if name in HEADLINE else ""
        label = f"{name} (headline)" if name in HEADLINE else name
        if "bf16" in name:
            vs_s = "—" if name == "c2c_1d_1024_b4096_bf16" else vs_s
        print(f"| {bold}{label}{bold} | {bold}{r['avg_ms']:.3f}{bold} | "
              f"{bold}{r['eff_gbps']:.1f}{bold} | "
              f"{bold}{r['pct_roofline']:.1f}{bold} | {vs_s} | "
              f"{r.get('route', '')} |")


if __name__ == "__main__":
    main(sys.argv[1])

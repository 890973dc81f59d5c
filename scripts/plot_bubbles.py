#!/usr/bin/env python3
"""Bubble-chain statistics from a -bubbleinfo.txt file.

Parity with the reference's scripts/plot_bubbles.py (chain-length stats +
histogram to PDF); the histogram is optional so the stats work without
matplotlib."""

import argparse
import re
import sys


def chain_sizes(path):
    sizes = []
    for line in open(path):
        m = re.match(r"chain id: (\d+)size: (\d+)", line)
        if m:
            sizes.append(int(m.group(2)))
    return sizes


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("bubbleinfo", help="path to <out>-bubbleinfo.txt")
    ap.add_argument("--pdf", default=None,
                    help="write a chain-length histogram to this PDF")
    args = ap.parse_args(argv)
    sizes = chain_sizes(args.bubbleinfo)
    if not sizes:
        print("no chains found")
        return 1
    sizes.sort()
    n = len(sizes)
    print(f"chains: {n}")
    print(f"bubbles total: {sum(sizes)}")
    print(f"chain length min/median/max: {sizes[0]} / "
          f"{sizes[n // 2]} / {sizes[-1]}")
    print(f"mean: {sum(sizes) / n:.2f}")
    if args.pdf:
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:
            print("matplotlib unavailable; skipping histogram",
                  file=sys.stderr)
            return 0
        plt.figure(figsize=(6, 4))
        plt.hist(sizes, bins=min(50, max(5, n // 2)))
        plt.xlabel("bubbles per chain")
        plt.ylabel("count")
        plt.title("Bubble-chain lengths")
        plt.tight_layout()
        plt.savefig(args.pdf)
        print(f"wrote {args.pdf}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

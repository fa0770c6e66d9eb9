#!/usr/bin/env python
"""Plot the (N, J) benchmark grid (reference examples/benchmark/plot.py
analog): seconds-per-evaluation vs N, one line per backend per J.

Usage: python benchmarks/plot.py bench.csv -o bench.png
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("csv")
    ap.add_argument("-o", "--output", default="bench.png")
    args = ap.parse_args()

    from celerite_tpu import plot_setup

    plot_setup.setup(auto=True)
    import matplotlib.pyplot as plt

    with open(args.csv) as f:
        rows = list(csv.DictReader(f))

    backends = [
        k[: -len("_time")] for k in rows[0] if k.endswith("_time")
    ]
    js = sorted({int(r["J"]) for r in rows})

    fig, ax = plt.subplots()
    for j in js:
        sub = [r for r in rows if int(r["J"]) == j]
        ns = [int(r["N"]) for r in sub]
        for style, backend in zip("o^sdv", backends):
            ts = [
                float(r["{0}_time".format(backend)])
                for r in sub
                if r.get("{0}_time".format(backend))
            ]
            if not ts:
                continue
            ax.loglog(
                ns[: len(ts)], ts, style + "-",
                label="{0} (J={1})".format(backend, j),
                alpha=0.8, ms=4,
            )
    # O(N) guide
    ns = sorted({int(r["N"]) for r in rows})
    ax.loglog(
        ns,
        [1e-6 * n / ns[0] for n in ns],
        "k:",
        alpha=0.5,
        label="O(N)",
    )
    ax.set_xlabel("number of data points N")
    ax.set_ylabel("log-likelihood time [s]")
    ax.legend(fontsize=7)
    fig.savefig(args.output)
    print("wrote", args.output)


if __name__ == "__main__":
    main()

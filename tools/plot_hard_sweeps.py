"""Render the hard-benchmark sweep comparison figure.

Plots val mAP@0.5 vs iteration for the four hard-benchmark arms
(supervised 24k, weak fixed-refresh, weak skewed-refresh, weak with the
r3 LR-shift collapse) from their committed eval_results.json sweeps.
If the job-53 continuation sweep (runHard_weak4) exists it is appended
to the fixed-refresh series. Output: docs/results/hard_benchmark_sweeps.png

Colors are the dataviz skill's validated default categorical palette,
slots 1-4 in fixed order.
"""
import json
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

HERE = os.path.dirname(os.path.abspath(__file__))
RESULTS = os.path.join(HERE, "..", "docs", "results")


def load(name):
    path = os.path.join(RESULTS, f"{name}_eval_results.json")
    if not os.path.exists(path):
        return []
    d = json.load(open(path))
    return [(r["iteration"], r["map"]) for r in d]


def stitched(base, cont_name):
    """Base sweep plus a -rl/-rd continuation sweep, overlap dropped."""
    pts = load(base)
    cont = load(cont_name)
    if pts and cont:
        pts = pts + [(i, m) for i, m in cont if i > pts[-1][0]]
    return pts


def main():
    runs = [
        ("supervised s1 (40b)", "#2a78d6", "-", 2.0, load("runHard_sup24k")),
        ("supervised s7 (61)", "#2a78d6", "--", 2.0, load("runHard_sup_s7")),
        ("weak s1, fixed refresh (46b+53)", "#eb6834", "-", 2.0,
         stitched("runHard_weak3", "runHard_weak4")),
        ("weak s7 (58+60)", "#eb6834", "--", 2.0,
         stitched("runHard_weak_s7", "runHard_weak_s7c")),
        ("weak, skewed refresh (46)", "#1baf7a", "-", 1.2,
         load("runHard_weak2")),
        ("weak, LR shift @8k (r3, 36)", "#eda100", "-", 1.2,
         load("runHard_weak")),
    ]
    fig, ax = plt.subplots(figsize=(7.2, 4.2), dpi=150)
    fig.patch.set_facecolor("#ffffff")
    ax.set_facecolor("#ffffff")
    xmax = 0
    for label, color, ls, lw, pts in runs:
        if not pts:
            continue
        xs, ys = zip(*pts)
        xmax = max(xmax, xs[-1])
        ax.plot(xs, ys, color=color, lw=lw, ls=ls, label=label,
                marker="o", ms=3 if lw > 1.5 else 2,
                mfc=color, mec="#ffffff", mew=0.8)
        ax.annotate(f"{ys[-1]:.3f}", (xs[-1], ys[-1]),
                    textcoords="offset points", xytext=(5, -2),
                    fontsize=8, color="#555555")
    ax.set_xlabel("iteration", fontsize=9, color="#333333")
    ax.set_ylabel("val mAP@0.5 (hard benchmark)", fontsize=9,
                  color="#333333")
    ax.set_title("Hard benchmark: eval-sweep mAP vs iteration",
                 fontsize=10, color="#1a1a19")
    ax.grid(True, color="#e8e8e4", lw=0.7)
    ax.set_axisbelow(True)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color("#c3c2b7")
    ax.tick_params(colors="#555555", labelsize=8)
    ax.legend(fontsize=8, frameon=False, loc="upper left")
    ax.set_xlim(0, xmax * 1.08)
    fig.tight_layout()
    out = os.path.join(RESULTS, "hard_benchmark_sweeps.png")
    fig.savefig(out)
    print(f"wrote {out}")


if __name__ == "__main__":
    sys.exit(main())

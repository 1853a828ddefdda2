"""Render the assessor-EMA A/B comparison figure (round 5).

Plots eval-sweep mAP@0.5 vs iteration for the pre-registered EMA lever
runs (``--assessor-ema 0.99``) against their same-seed, same-config
baselines (runH family), one color per seed, dashed = baseline,
solid = EMA. Horizontal guides mark the paired supervised runs.
Output: docs/results/ema_lever_sweeps.png

Colors are the dataviz skill's validated default categorical palette.
"""
import json
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

HERE = os.path.dirname(os.path.abspath(__file__))
RESULTS = os.path.join(HERE, "..", "docs", "results")

# seed -> (ema run, baseline run, supervised best, color)
ARMS = {
    3: ("runEma_s3", "runH_s3", 0.8776, "#2a78d6"),
    4: ("runEma_s4", "runH_s4", 0.9290, "#eb6834"),
    1: ("runEma_s1", "runH_s1", 0.9315, "#1baf7a"),
    7: ("runEma_s7", "runE_seed7", 0.8954, "#eda100"),
    2: ("runEma_s2", "runH_s2", 0.9067, "#9467bd"),
}


def load(name):
    path = os.path.join(RESULTS, f"{name}_eval_results.json")
    if not os.path.exists(path):
        return []
    return [(r["iteration"], r["map"]) for r in json.load(open(path))]


def main():
    fig, ax = plt.subplots(figsize=(7.2, 4.2), dpi=150)
    fig.patch.set_facecolor("#ffffff")
    ax.set_facecolor("#ffffff")
    xmax = 0
    for seed, (ema, base, sup, color) in sorted(ARMS.items()):
        pts = load(ema)
        if not pts:
            continue
        xs, ys = zip(*pts)
        xmax = max(xmax, xs[-1])
        ax.plot(xs, ys, color=color, lw=2, label=f"seed {seed} +EMA",
                marker="o", ms=3, mfc=color, mec="#ffffff", mew=0.8)
        bpts = load(base)
        if bpts:
            bx, by = zip(*bpts)
            ax.plot(bx, by, color=color, lw=1.2, ls="--", alpha=0.7,
                    label=f"seed {seed} baseline")
        ax.axhline(sup, color=color, lw=0.8, ls=":", alpha=0.5)
        ax.annotate(f"sup s{seed} {sup:.3f}", (xmax * 0.02, sup),
                    fontsize=7, color=color, alpha=0.8,
                    textcoords="offset points", xytext=(0, 2))
    ax.set_xlabel("iteration", fontsize=9, color="#333333")
    ax.set_ylabel("val mAP@0.5", fontsize=9, color="#333333")
    ax.set_title("Assessor-EMA lever vs same-seed baselines "
                 "(dotted = paired supervised best)",
                 fontsize=10, color="#1a1a19")
    ax.grid(True, color="#e8e8e4", lw=0.7)
    ax.set_axisbelow(True)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color("#c3c2b7")
    ax.tick_params(colors="#555555", labelsize=8)
    ax.legend(fontsize=7, frameon=False, loc="lower right", ncol=2)
    ax.set_ylim(0, 1.0)
    fig.tight_layout()
    out = os.path.join(RESULTS, "ema_lever_sweeps.png")
    fig.savefig(out)
    print(f"wrote {out}")


if __name__ == "__main__":
    sys.exit(main())

"""Summary figure generation from analysis results.

The equivalent of the reference's benchmarks/make_summary_figure.py +
downstream/figures.py: one committed PNG that shows the accuracy story
(per-category SP and TC by config) and the cost story (total wall) from
a benchmarks/analysis.py JSON artifact.

    python -m benchmarks.downstream.figures \\
        --analysis benchmarks/results/analysis_r05.json \\
        --out benchmarks/results/summary_r05.png

Design notes: colors are the dataviz reference categorical palette
(validated for CVD separation and contrast on the light surface),
assigned to configs in fixed slot order; one measure per axis; grids
recessive; series identity carried by the legend, not by text color.
"""

import argparse
import json
import sys

# validated reference palette, light mode, fixed slot order
PALETTE = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100", "#e87ba4",
           "#008300", "#4a3aa7"]
SURFACE = "#fcfcfb"
TEXT = "#0b0b0b"
TEXT2 = "#52514e"
GRID = "#e4e3df"


def make_summary_figure(payload: dict, out_path: str, title: str = None):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    per_cat = payload["per_category"]
    overall = payload["overall"]
    configs = [r["config"] for r in overall]
    cats = sorted({r["category"] for r in per_cat})
    by = {(r["config"], r["category"]): r for r in per_cat}

    fig, axes = plt.subplots(
        3, 1, figsize=(max(8, 1.1 * len(cats) + 2), 10),
        gridspec_kw=dict(height_ratios=[3, 3, 1.2], hspace=0.55))
    fig.patch.set_facecolor(SURFACE)

    def style(ax):
        ax.set_facecolor(SURFACE)
        for s in ("top", "right"):
            ax.spines[s].set_visible(False)
        for s in ("left", "bottom"):
            ax.spines[s].set_color(GRID)
        ax.tick_params(colors=TEXT2, labelsize=8)
        ax.yaxis.grid(True, color=GRID, linewidth=0.7)
        ax.set_axisbelow(True)

    width = 0.8 / max(len(configs), 1)
    x = np.arange(len(cats))
    for pi, metric, label in ((0, "mean_sp", "mean SP (recall)"),
                              (1, "mean_tc", "mean TC")):
        ax = axes[pi]
        style(ax)
        for ci, cfg in enumerate(configs):
            vals = [by.get((cfg, c), {}).get(metric, 0.0) for c in cats]
            ax.bar(x + ci * width - 0.4 + width / 2, vals,
                   width=width * 0.92, color=PALETTE[ci % len(PALETTE)],
                   label=cfg, edgecolor=SURFACE, linewidth=0.8)
        ax.set_xticks(x)
        ax.set_xticklabels(cats, rotation=20, ha="right", color=TEXT2)
        ax.set_ylim(0, 1.0)
        ax.set_ylabel(label, color=TEXT, fontsize=9)
        if pi == 0:
            ax.legend(loc="lower right", fontsize=8, frameon=False,
                      ncols=min(len(configs), 4), labelcolor=TEXT)

    ax = axes[2]
    style(ax)
    walls = [r["total_wall_s"] for r in overall]
    ypos = np.arange(len(configs))
    ax.barh(ypos, walls, height=0.55,
            color=[PALETTE[i % len(PALETTE)] for i in range(len(configs))],
            edgecolor=SURFACE, linewidth=0.8)
    ax.set_yticks(ypos)
    ax.set_yticklabels(configs, color=TEXT2, fontsize=8)
    ax.invert_yaxis()
    ax.xaxis.grid(True, color=GRID, linewidth=0.7)
    ax.yaxis.grid(False)
    ax.set_xlabel("total wall over registry (s)", color=TEXT, fontsize=9)
    for yi, w in zip(ypos, walls):
        ax.text(w, yi, f" {w:.2f}s", va="center", fontsize=8, color=TEXT2)

    fig.suptitle(title or "kalign-tpu benchmark registry: accuracy and "
                 "cost by config", color=TEXT, fontsize=12, y=0.995)
    base = payload.get("baseline")
    sig = [s for s in payload.get("significance", [])
           if s.get("significant_0.05")]
    note = (f"baseline for significance: {base}; "
            f"{len(sig)} of {len(payload.get('significance', []))} "
            "paired comparisons significant at Holm-corrected p<0.05")
    fig.text(0.01, 0.005, note, color=TEXT2, fontsize=7)
    fig.savefig(out_path, dpi=150, bbox_inches="tight",
                facecolor=SURFACE)
    plt.close(fig)
    return out_path


def main(argv=None):
    ap = argparse.ArgumentParser(prog="benchmarks.downstream.figures")
    ap.add_argument("--analysis", required=True,
                    help="JSON from benchmarks.analysis --json")
    ap.add_argument("--out", required=True)
    ap.add_argument("--title", default=None)
    args = ap.parse_args(argv)
    with open(args.analysis) as fh:
        payload = json.load(fh)
    out = make_summary_figure(payload, args.out, args.title)
    print(json.dumps({"figure": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Controller quality/latency frontier figure (docs/controller_frontier_r4.png).

Reads the committed protocol artifacts (mpc_results_*.json, 20-action
reference protocol: 5 source locations x 4 episodes, horizon 5, 256 shots,
alpha=1 — reference scripts/test.jl + scripts/mpc.jl) and plots scattered-
energy decrease vs warm episode latency per controller family. Reproduce:

    python scripts_tpu/plot_frontier.py [--out docs/controller_frontier_r4.png]

Points whose JSON is absent (wiped scratch run not re-measured) are skipped,
so the figure always reflects committed artifacts only.
"""
import argparse
import json
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

# file, family, short label (direct labels are selective: key points only)
POINTS = [
    ("mpc_results_ft_hybrid16.json", "hybrid", "topk=16"),
    ("mpc_results_ft_hybrid32.json", "hybrid", "topk=32"),
    ("mpc_results_ft_hybrid64.json", "hybrid", "topk=64"),
    ("mpc_results_ft_hybrid128.json", "hybrid", "topk=128", (-62, 4)),
    ("mpc_results_ft_noprune256.json", "hybrid", "no-prune 256", (7, -13)),
    ("mpc_results_ft_hybrid64_r2.json", "hybrid", "64x2 rounds"),
    ("mpc_results_ft_hybrid16_fused.json", "hybrid", "fused 16"),
    ("mpc_results_ft_hybrid16_rr175.json", "hybrid", "16@175^2"),
    ("mpc_results_hybrid16_cem.json", "hybrid", "CEM pool"),
    ("mpc_results_oracle64.json", "oracle", "64 shots"),
    ("mpc_results_oracle256.json", "oracle", "256 shots", (-55, 8)),
    ("mpc_results_h8s4.json", "surrogate", "shooting"),
    ("mpc_results_h8s4_cem.json", "surrogate", "CEM"),
    ("mpc_results_ft_shoot.json", "surrogate", None),
    ("mpc_results_ens2.json", "surrogate", None),
    ("mpc_results_h8s4_hor8.json", "surrogate", None),
    ("mpc_results_rank400.json", "surrogate", None),
    ("mpc_results_pools_shoot.json", "distilled", "shooting"),
    ("mpc_results_pools_cem.json", "distilled", "CEM"),
    ("mpc_results_pools_hybrid32.json", "hybrid", "distilled topk=32"),
    ("mpc_results_pools2_cem.json", "distilled", "CEM pools2"),
    ("mpc_results_pools2_grad.json", "gradient", "pure gradient"),
    ("mpc_results_pools2_cem_polish.json", "gradient", "CEM+polish 5"),
    ("mpc_results_pools2_cem_polish10.json", "gradient",
     "CEM+polish 10", (-78, 6)),
    ("mpc_results_pools2_cem_polish20.json", "gradient", "CEM+polish 20"),
    ("mpc_results_pools3_cem.json", "distilled", "CEM pools3 (DAgger)",
     (-55, -14)),
    ("mpc_results_pools3_cem_polish10.json", "gradient",
     "pools3 CEM+polish 10 (record)", (-118, 7)),
    ("mpc_results_pools4_cem.json", "distilled", "CEM pools4"),
    ("mpc_results_pools4_cem_polish10.json", "gradient",
     "pools4 CEM+polish 10"),
    ("mpc_results_bc_policy.json", "policy",
     "one-shot policy (zero search)", (-40, 8)),
]

FAMILIES = {  # palette slots 1-3 (validated all-pairs subset)
    "hybrid": ("#2a78d6", "Hybrid prune + exact re-rank", "o"),
    "oracle": ("#eb6834", "True-simulator oracle", "s"),
    "surrogate": ("#1baf7a", "Pure surrogate", "^"),
    "distilled": ("#8a63d2", "Ranking-distilled surrogate", "D"),
    "gradient": ("#c2417e", "Gradient-polished (differentiable rollout)", "v"),
    "policy": ("#a87b00", "Amortized one-shot policy (no search)", "*"),
}
SURFACE, INK, INK2 = "#fcfcfb", "#0b0b0b", "#52514e"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="docs/controller_frontier_r4.png")
    args = p.parse_args()

    fig, ax = plt.subplots(figsize=(8.4, 5.2), dpi=150)
    fig.patch.set_facecolor(SURFACE)
    ax.set_facecolor(SURFACE)

    seen_families = []
    for fname, family, label, *off in POINTS:
        if not os.path.exists(fname):
            continue
        d = json.load(open(fname))
        if d.get("actions") not in (None, 20):  # 20-action protocol only
            continue
        lat = (d.get("mpc_episode_seconds") or {}).get("warm_mean")
        q = d.get("mean_decrease")
        if lat is None or q is None:
            continue
        color, fam_label, marker = FAMILIES[family]
        ax.scatter(
            lat, 100 * q, s=130 if marker == "*" else 52,
            color=color, marker=marker, zorder=3,
            edgecolors=SURFACE, linewidths=1.2,
            label=fam_label if family not in seen_families else None,
        )
        seen_families.append(family)
        if label:
            ax.annotate(
                label, (lat, 100 * q), textcoords="offset points",
                xytext=off[0] if off else (7, 5), fontsize=8, color=INK2,
            )

    ax.set_xscale("log")
    ax.set_xlabel("episode latency, warm (s, log scale)", color=INK)
    ax.set_ylabel("scattered-energy decrease vs random (%)", color=INK)
    ax.set_title(
        "Controller quality vs latency — 20-action reference protocol",
        color=INK, fontsize=11, loc="left",
    )
    ax.axhline(42.6, color=INK2, lw=0.8, ls=":", zorder=1)
    ax.annotate("raw-oracle ceiling (+42.6%)", (0.62, 42.9), fontsize=8, color=INK2)
    ax.axvline(1.0, color=INK2, lw=0.8, ls=":", zorder=1)
    ax.annotate("<1 s north star", (1.06, 25.6), fontsize=8, color=INK2)
    ax.grid(True, which="major", color="#e6e5e2", lw=0.6, zorder=0)
    ax.tick_params(colors=INK2)
    for s in ax.spines.values():
        s.set_color("#d8d7d3")
    ax.legend(loc="lower right", frameon=False, fontsize=9, labelcolor=INK)
    fig.tight_layout()
    fig.savefig(args.out, facecolor=SURFACE)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

"""Classify residual golden-parity mismatches (VERDICT r4 item 4).

With the learner sample-density deviation eliminated (``cfg.parity_density``),
the remaining disagreements need re-classification from the records:

  * ``threshold-edge``: both planners follow the same goals and nearly
    the same trajectory; the SUCCESS verdict flips on the collision-count
    allowance (reference ``omg/cost.py:489-494``: execute iff
    collide <= allow_collision_point(=5) AND smooth below threshold) —
    one grazing contact point on the boundary.
  * ``goal-tie-break``: the learner's selected-goal sequence diverges
    mid-plan (near-equal cost-vector entries resolved differently under
    different FMA contraction), and the trajectories separate from that
    step on — the known bit-arithmetic class (docs/PARITY.md r4).

Usage: python scripts/parity_classify.py [--ws .parity_suite_ws]
       [--out docs/parity_classes_r05.json]
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def classify(o, r) -> dict:
    row = {}
    so, sr = o["selected_goals"], r["selected_goals"]
    k = min(len(so), len(sr))
    div = next((i for i in range(k) if so[i] != sr[i]), None)
    row["first_goal_divergence_step"] = div
    row["goal_agreement"] = float((so[:k] == sr[:k]).mean()) if k else None
    to, tr = o["traj"], r["traj"]
    if to.shape == tr.shape and len(to):
        row["traj_linf"] = float(np.abs(to - tr).max())
    row["collide_ours"] = float(o["collide"])
    row["collide_ref"] = float(r["collide"])
    row["smooth_ours"] = float(o["smooth"])
    row["smooth_ref"] = float(r["smooth"])
    row["flag_ours"], row["flag_ref"] = bool(o["flag"]), bool(r["flag"])
    allow = 5.0  # cfg.allow_collision_point default
    near_thresh = (abs(row["collide_ours"] - allow) <= 2
                   or abs(row["collide_ref"] - allow) <= 2)
    same_goals = div is None
    drifted = (same_goals and row["flag_ours"] and not row["flag_ref"]
               and row["collide_ref"] > allow + 4
               and int(o["steps_used"]) < int(r["steps_used"]))
    if drifted:
        # the r4-diagnosed full-budget un-solving (docs/
        # diag_full_budget_r04.json): the smoothness boost keeps
        # re-weighting the tradeoff past the executable state; we
        # pre-terminate (or snapshot) there, the reference optimizes on
        # and ends colliding
        row["class"] = "full-budget-drift"
        row["why"] = (f"same goals; we stop executable at step "
                      f"{int(o['steps_used'])} (collide "
                      f"{row['collide_ours']:.0f}), the reference "
                      f"optimizes to step {int(r['steps_used'])} and "
                      f"ends at collide {row['collide_ref']:.0f}")
    elif same_goals and row.get("traj_linf", 9) < 0.25 and near_thresh:
        row["class"] = "threshold-edge"
        row["why"] = (f"same goal sequence, traj_linf "
                      f"{row.get('traj_linf'):.3f}; collide "
                      f"{row['collide_ours']:.0f} vs "
                      f"{row['collide_ref']:.0f} around the allowance 5")
    elif div is not None:
        row["class"] = "goal-tie-break"
        row["why"] = (f"selected goals diverge at step {div} "
                      f"(agreement {row['goal_agreement']:.2f}); "
                      f"trajectories separate after the flip")
    else:
        row["class"] = "threshold-edge" if near_thresh else "other"
        row["why"] = "same goals; verdict criteria differ at the boundary"
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ws", default=".parity_suite_ws")
    ap.add_argument("--out", default="docs/parity_classes_r05.json")
    args = ap.parse_args()
    rec = os.path.join(os.path.abspath(args.ws), "records")
    rows = {}
    for op in sorted(glob.glob(os.path.join(rec, "ours_*.npz"))):
        name = os.path.basename(op)[5:-4]
        rp = os.path.join(rec, f"ref_{name}.npz")
        if not os.path.exists(rp):
            continue
        o, r = np.load(op), np.load(rp)
        if bool(o["flag"]) == bool(r["flag"]):
            to, tr = o["traj"], r["traj"]
            if to.shape == tr.shape and len(to) and \
                    float(np.abs(to - tr).max()) <= 0.15:
                continue
        rows[name] = classify(o, r)
        print(name, rows[name]["class"], "-", rows[name]["why"],
              flush=True)
    counts = {}
    for v in rows.values():
        counts[v["class"]] = counts.get(v["class"], 0) + 1
    out = {"what": __doc__.split("\n")[0],
           "density_deviation_eliminated": True,
           "classes": counts, "mismatches": rows}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"classes": counts}))
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()

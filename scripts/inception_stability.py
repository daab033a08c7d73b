"""Inception late-training stability analysis (VERDICT r4 item 5).

Round 4's Inception ROC study left an open question: 4 of our 10 runs
ended in a late-training high-ambient-FAPH wobble (last-checkpoint
streamed FRR@2faph 0.6-0.8) that the reference's runs happened not to
show.  Candidate causes were trainer divergences (BN momentum/epsilon,
Adam epsilon, init fans) -- but scripts/trainer_ab.py --model inception
already proves per-step update equivalence with transplanted weights, so
any real divergence must be distributional.  This script settles it
statistically and by trajectory on a larger matched-seed study
(scripts/roc_parity.py --model inception --seeds N):

1. last-checkpoint wobble rates per arm (ref / ours_on_ref / ours) with a
   Fisher exact test ref-vs-ours;
2. per-eval `average_viable_recall` trajectories (ours: metrics.jsonl;
   reference: its TensorBoard validation events) -- mid/late-training AVR
   collapses count as trajectory wobbles even when best-checkpoint
   selection recovers them.

Run after the study:
  python scripts/inception_stability.py --workdir /tmp/incep_r5
Writes tests/golden/inception_stability_report.json.
"""

import argparse
import glob
import json
import os

import numpy as np

WOBBLE_FRR = 0.5  # last-checkpoint streamed FRR@2faph above this = wobble
AVR_COLLAPSE = 0.5  # validation AVR below this after warmup = trajectory dip


def frr_at_2(rec):
    """FRR@2faph from a per-seed record (roc_parity run_one stores the
    condensed frr_at_faph table; fall back to the raw curve)."""
    if "frr_at_faph" in rec:
        return float(rec["frr_at_faph"]["2.0"])
    faph = np.asarray(rec["faph"])
    frr = np.asarray(rec["frr"])
    if len(faph) == 0:
        return 1.0
    idx = np.argmin(np.abs(faph - 2.0))
    return float(frr[idx])


def ours_trajectory(run_dir):
    path = os.path.join(run_dir, "metrics.jsonl")
    steps, avr = [], []
    if not os.path.exists(path):
        return steps, avr
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            v = rec.get("validation") or {}
            if "average_viable_recall" in v:
                steps.append(int(rec["step"]))
                avr.append(float(v["average_viable_recall"]))
    return steps, avr


def ref_trajectory(run_dir):
    """average_viable_recall scalars from the reference's TB events."""
    import tensorflow as tf

    steps, avr = [], []
    for path in sorted(
        glob.glob(os.path.join(run_dir, "logs", "validation", "events.*"))
    ):
        for ev in tf.compat.v1.train.summary_iterator(path):
            for v in ev.summary.value:
                if v.tag == "average_viable_recall":
                    t = tf.make_ndarray(v.tensor) if v.HasField("tensor") else v.simple_value
                    steps.append(int(ev.step))
                    avr.append(float(np.asarray(t).reshape(())))
    order = np.argsort(steps)
    return [steps[i] for i in order], [avr[i] for i in order]


def trajectory_stats(steps, avr, total_steps):
    """Counts AVR collapses after the model has first reached AVR>=0.9."""
    if not steps:
        return {"n_evals": 0}
    avr = np.asarray(avr)
    steps = np.asarray(steps)
    reached = np.nonzero(avr >= 0.9)[0]
    out = {
        "n_evals": int(len(avr)),
        "final_avr": float(avr[-1]),
        "min_avr_last_quarter": float(
            avr[steps >= 0.75 * total_steps].min()
            if (steps >= 0.75 * total_steps).any() else avr[-1]
        ),
    }
    if len(reached):
        after = avr[reached[0]:]
        out["collapses_after_first_convergence"] = int(
            np.sum((after[:-1] >= AVR_COLLAPSE) & (after[1:] < AVR_COLLAPSE))
        ) + int(after[0] < AVR_COLLAPSE)
        # dwell: fraction of post-convergence evals spent inside a collapse
        # episode = P(the final checkpoint lands in one).  If both trainers
        # collapse equally often but ours dwells longer, last-checkpoint
        # wobble rates differ with identical dynamics frequency.
        out["evals_below_after_convergence"] = int(np.sum(after < AVR_COLLAPSE))
        out["frac_evals_in_collapse"] = round(
            float(np.mean(after < AVR_COLLAPSE)), 4
        )
    else:
        out["never_converged"] = True
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", type=str, required=True)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--merge-golden", type=str, default=None,
                    help="merge per-seed last/best FRRs from a prior "
                         "roc_parity golden report (runs are deterministic "
                         "per seed, so prior-round seeds are the same "
                         "experiment; fresh workdir seeds take precedence "
                         "and contribute trajectories)")
    ap.add_argument("--ref-rescored", type=str, default=None,
                    help="json of {seed: {last/best: {frr_at_2faph}}} from "
                         "scoring the reference's TFLite endpoints through "
                         "OUR (interpolation-bug-fixed) evaluator; replaces "
                         "the ref arm's own-evaluator FRRs so wobble rates "
                         "are scored consistently.  The reference's "
                         "generate_roc_curve fabricates FRR at the 2-faph "
                         "anchor when NO cutoff is viable (test.py:170-172, "
                         "parity.md §8.2), which systematically masks "
                         "collapse-saturated endpoints.")
    args = ap.parse_args()

    res_dir = os.path.join(args.workdir, "seed_results")
    arms = {}
    if args.merge_golden:
        with open(args.merge_golden) as f:
            golden = json.load(f)
        for arm, seeds in golden.get("per_seed", {}).items():
            recs = seeds.values() if isinstance(seeds, dict) else seeds
            for rec in recs:
                rec = dict(rec, source="prior_round_golden")
                arms.setdefault(arm, {})[int(rec["seed"])] = rec
    for path in sorted(glob.glob(os.path.join(res_dir, "inception_*.json"))):
        name = os.path.basename(path)[len("inception_"):-len(".json")]
        arm, seed = name.rsplit("_", 1)
        with open(path) as f:
            rec = json.load(f)
        arms.setdefault(arm, {})[int(seed)] = rec  # fresh run wins

    if args.ref_rescored:
        with open(args.ref_rescored) as f:
            rescored = json.load(f)
        for seed, res in rescored.items():
            rec = arms.get("ref", {}).get(int(seed))
            if rec is None:
                continue
            for which in ("last", "best"):
                if which in res:
                    rec[which] = dict(
                        rec[which],
                        frr_at_faph={"2.0": res[which]["frr_at_2faph"]},
                        rescored_by_our_evaluator=True,
                    )
        report_note = (
            "ref arm FRRs rescored through OUR evaluator (the reference's "
            "generate_roc_curve fabricates frr at the 2-faph anchor when no "
            "cutoff is viable, masking collapse-saturated endpoints)"
        )
    else:
        report_note = None

    report = {"wobble_frr_threshold": WOBBLE_FRR, "arms": {}}
    if report_note:
        report["scoring_note"] = report_note
    for arm, by_seed in sorted(arms.items()):
        rows = []
        for seed, rec in sorted(by_seed.items()):
            last = frr_at_2(rec["last"])
            best = frr_at_2(rec["best"])
            run_dir = os.path.join(args.workdir, "runs", f"inception_{arm}_{seed}")
            traj = (
                ref_trajectory(run_dir) if arm == "ref"
                else ours_trajectory(run_dir)
            )
            rows.append({
                "seed": seed,
                "last_frr_at_2faph": round(last, 4),
                "best_frr_at_2faph": round(best, 4),
                "last_wobbles": last > WOBBLE_FRR,
                "trajectory": trajectory_stats(*traj, args.steps),
            })
        n = len(rows)
        wob = sum(r["last_wobbles"] for r in rows)
        best_wob = sum(r["best_frr_at_2faph"] > WOBBLE_FRR for r in rows)
        dips = sum(
            r["trajectory"].get("collapses_after_first_convergence", 0)
            for r in rows
        )
        report["arms"][arm] = {
            "seeds": n,
            "last_checkpoint_wobbles": wob,
            "best_checkpoint_wobbles": best_wob,
            "wobble_rate": round(wob / n, 3) if n else None,
            "trajectory_collapses_total": dips,
            "mean_frac_evals_in_collapse": round(float(np.mean([
                r["trajectory"].get("frac_evals_in_collapse", 0.0)
                for r in rows
            ])), 4) if rows else None,
            "seeds_with_any_trajectory_collapse": sum(
                1 for r in rows
                if r["trajectory"].get("collapses_after_first_convergence", 0) > 0
            ),
            "best_recovered": sum(
                1 for r in rows
                if r["last_wobbles"] and r["best_frr_at_2faph"] < WOBBLE_FRR
            ),
            "per_seed": rows,
        }

    # Fisher exact: is ours' wobble rate distinguishable from the ref's?
    try:
        from scipy.stats import fisher_exact

        for ours_arm in ("ours", "ours_on_ref"):
            if "ref" in report["arms"] and ours_arm in report["arms"]:
                a = report["arms"][ours_arm]
                r = report["arms"]["ref"]
                table = [
                    [a["last_checkpoint_wobbles"], a["seeds"] - a["last_checkpoint_wobbles"]],
                    [r["last_checkpoint_wobbles"], r["seeds"] - r["last_checkpoint_wobbles"]],
                ]
                report[f"fisher_{ours_arm}_vs_ref"] = {
                    "table": table,
                    "p_value": round(float(fisher_exact(table)[1]), 4),
                }
    except ImportError:
        pass

    out = args.out or os.path.join(
        os.path.dirname(__file__), "..", "tests", "golden",
        "inception_stability_report.json",
    )
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    brief = {
        arm: {k: v for k, v in rec.items() if k != "per_seed"}
        for arm, rec in report["arms"].items()
    }
    brief.update({k: v for k, v in report.items() if k.startswith("fisher")})
    print(json.dumps(brief, indent=1))
    print(f"wrote {os.path.normpath(out)}")


if __name__ == "__main__":
    main()

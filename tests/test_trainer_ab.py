"""Cross-framework trainer step-equivalence (scripts/trainer_ab.py).

Transplants a reference Keras MixedNet's initial weights into our pytree
and runs both trainers on identical batches: forward probabilities must
agree to float tolerance and per-step training losses must track (the
update rules are the same function; only fp rounding order differs).
"""
import importlib.util
import os
import subprocess
import sys

import numpy as np
import pytest


def test_trainer_step_equivalence(tmp_path):
    script = os.path.join(
        os.path.dirname(__file__), "..", "scripts", "trainer_ab.py"
    )
    out = tmp_path / "ab.json"
    r = subprocess.run(
        [sys.executable, script, "--steps", "12", "--batch", "16",
         "--out", str(out)],
        capture_output=True, text=True, timeout=500,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    import json

    rep = json.loads(out.read_text())
    # identical weights -> identical probabilities (pure fp tolerance)
    assert rep["forward_prob_max_diff"] < 1e-5
    # identical batches -> matching per-step losses (fp drift only; the
    # first steps agree to ~1e-6 and drift grows smoothly)
    d = np.abs(
        np.asarray(rep["reference_losses"]) - np.asarray(rep["our_losses"])
    )
    assert d[0] < 1e-5
    assert d.max() < 0.02
    assert rep["post_training_prob_max_diff"] < 0.05


def test_trainer_step_equivalence_inception(tmp_path):
    """Inception family (VERDICT r3 item 6): same transplant-and-train A/B
    as MixedNet, via the graph-driven Keras->flax weight mapping."""
    script = os.path.join(
        os.path.dirname(__file__), "..", "scripts", "trainer_ab.py"
    )
    out = tmp_path / "ab_inception.json"
    r = subprocess.run(
        [sys.executable, script, "--model", "inception", "--steps", "12",
         "--batch", "16", "--out", str(out)],
        capture_output=True, text=True, timeout=500,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    import json

    rep = json.loads(out.read_text())
    assert rep["model"] == "inception"
    assert rep["forward_prob_max_diff"] < 1e-5
    d = np.abs(
        np.asarray(rep["reference_losses"]) - np.asarray(rep["our_losses"])
    )
    # identical update rule: step 0 agrees to float tolerance; later steps
    # drift chaotically and the AMPLITUDE is run-dependent (TF/oneDNN
    # reduction order varies across runs), so the growth bound is loose
    # for this deeper model -- observed 1.5e-2 to 4.2e-2 across runs
    assert d[0] < 1e-5
    assert d[:4].max() < 5e-3
    assert d.max() < 0.1
    assert rep["post_training_prob_max_diff"] < 0.15

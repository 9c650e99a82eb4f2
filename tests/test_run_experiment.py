"""Cross-process orchestration test: trainer + loop evaluator as separate
OS processes coordinating through the checkpoint directory, then a final
test eval from the promoted best — the reference's two-process topology
(scripts/commands/*.sh:2-7, SURVEY.md section 1 layer 10)."""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_two_process_train_eval_promote(tmp_path):
    train_dir = tmp_path / "exp"
    cmd = [
        sys.executable, str(REPO / "tools" / "run_experiment.py"),
        "--preset", "TCResNet8-1.0",
        "--synthetic", "--synthetic-samples", "192",
        "--clip-duration-ms", "250",
        "--batch-size", "16",
        "--max-step", "8",
        "--step-save-checkpoint", "4",
        "--steps-per-call", "2",
        "--train-device", "cpu",
        "--eval-device", "cpu",
        "--eval-poll-timeout", "120",
        "--train-dir", str(train_dir),
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=540)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]

    # the loop evaluator (second process) scored checkpoints written by
    # the concurrently running trainer and promoted a best
    best = train_dir / "best" / "valid" / "accuracy"
    steps = [p.name for p in best.iterdir() if p.is_dir() and p.name.isdigit()]
    assert steps, f"no promoted best under {best}"
    assert (best / "scores.tsv").exists()

    # valid metrics were recorded by the watching process
    valid_jsonl = train_dir / "valid_metrics.jsonl"
    assert valid_jsonl.exists()
    records = [json.loads(l) for l in valid_jsonl.read_text().splitlines()]
    eval_steps = {r["step"] for r in records}
    assert 8 in eval_steps  # final checkpoint evaluated

    # the final test eval ran from the promoted best (it writes its own
    # metrics under the test split)
    test_jsonl = train_dir / "test_metrics.jsonl"
    assert test_jsonl.exists()

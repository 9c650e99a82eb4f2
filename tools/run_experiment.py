#!/usr/bin/env python
"""Per-experiment orchestrator: trainer + loop evaluator + final test eval.

Reference parity: the per-experiment shell scripts
(/root/reference/scripts/commands/*.sh:2-7 and execute_script.sh) — the
reference's defining runtime shape (SURVEY.md section 1, layer 10):

  1. `trap 'pkill -P $$' EXIT` cleanup of child processes      (:2)
  2. trainer process writing checkpoints to the train dir      (:3-4)
  3. `evaluate_audio.py --valid_type loop` process watching the
     same dir, scoring every checkpoint, promoting bests        (:5-6)
  4. after both finish, a final test-split evaluation loading
     the promoted `valid/accuracy` best checkpoint              (:7)

The two children coordinate purely through the filesystem (checkpoint
dir polling), exactly like the reference. On a single-chip host the
evaluator defaults to CPU so it never contends with the trainer for the
accelerator; on a pod slice, point --eval-device at a spare host/chip.

Example:
  python tools/run_experiment.py --preset TCResNet8-1.0 \
      --dataset-root ~/gsc_v1 --train-dir runs/%DATE%_tcresnet8
  python tools/run_experiment.py --preset TCResNet8-1.0 --synthetic \
      --max-step 60 --train-dir /tmp/exp
"""

from __future__ import annotations

import argparse
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.train import build_config  # noqa: E402

_TOOLS = Path(__file__).resolve().parent


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="TCResNet8-1.0")
    p.add_argument("--dataset-root", default=None)
    p.add_argument("--cache-dir", default=None)
    p.add_argument("--train-dir", required=True)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic-samples", type=int, default=4096)
    p.add_argument("--max-step", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--num-silent", type=int, default=None,
                   help="silence samples injected into the TRAIN split "
                        "(reference --num_silent; default: auto = "
                        "split_size // num_labels)")
    p.add_argument("--num-silent-valid", type=int, default=None,
                   help="silence count for the valid-loop evaluator "
                        "(reference passes a per-split count, e.g. 258; "
                        "default: per-split auto)")
    p.add_argument("--num-silent-test", type=int, default=None,
                   help="silence count for the final test eval (reference "
                        "e.g. 257; default: per-split auto)")
    p.add_argument("--steps-per-call", type=int, default=None)
    p.add_argument("--compute-dtype", choices=["float32", "bfloat16"], default=None)
    p.add_argument("--step-save-checkpoint", type=int, default=None)
    p.add_argument("--clip-duration-ms", type=int, default=None)
    p.add_argument("--train-device", choices=["auto", "cpu"], default="auto")
    p.add_argument("--eval-device", choices=["auto", "cpu"], default="cpu",
                   help="device for the loop evaluator (default cpu: a "
                        "single chip cannot host both processes)")
    p.add_argument("--best-metric", default="accuracy",
                   help="valid metric whose promoted best the final test "
                        "eval loads (reference: valid/accuracy)")
    p.add_argument("--final-split", default="test",
                   help="split for the final evaluation ('' to skip)")
    p.add_argument("--eval-poll-timeout", type=float, default=600.0,
                   help="loop evaluator exits after this many idle seconds "
                        "without a new checkpoint (crash safety net)")
    p.add_argument("--cfg", action="append", default=[],
                   metavar="SECTION.FIELD=VALUE",
                   help="generic config override, forwarded to the "
                        "trainer and both evaluator processes")
    return p.parse_args(argv)


def _passthrough(args, *names):
    out = []
    for name in names:
        v = getattr(args, name.replace("-", "_"))
        if v is True:
            out.append(f"--{name}")
        elif v is not None and v is not False:
            out += [f"--{name}", str(v)]
    return out


def _silent(flag_value):
    """Per-split silence counts: the reference passes a distinct
    --num_silent to each process (1854/258/257, scripts/commands/*.sh:3-7).
    Unset per-split flags fall back to the loader's per-split auto
    (split_size // num_labels) rather than inheriting the train count."""
    return [] if flag_value is None else ["--num-silent", str(flag_value)]


def build_commands(args, train_dir):
    """The three child command lines (trainer, loop evaluator, final test
    eval). Split out of main() so tests can assert per-process flags
    without spawning processes."""
    common = _passthrough(
        args, "preset", "dataset-root", "cache-dir", "synthetic",
        "synthetic-samples", "compute-dtype", "clip-duration-ms",
    )
    for item in getattr(args, "cfg", []) or []:
        common += ["--cfg", item]
    train_cmd = (
        [sys.executable, str(_TOOLS / "train.py")]
        + common
        + _silent(args.num_silent)
        + ["--train-dir", train_dir, "--eval-split", "", "--device", args.train_device]
        + _passthrough(
            args, "max-step", "batch-size", "seed", "steps-per-call",
            "step-save-checkpoint",
        )
    )
    eval_cmd = (
        [sys.executable, str(_TOOLS / "evaluate.py")]
        + common
        + _silent(args.num_silent_valid)
        + ["--train-dir", train_dir, "--split", "valid", "--valid-type", "loop",
           "--device", args.eval_device,
           "--timeout", str(args.eval_poll_timeout)]
        + _passthrough(args, "max-step")
    )
    final_cmd = (
        [sys.executable, str(_TOOLS / "evaluate.py")]
        + common
        + _silent(args.num_silent_test)
        + ["--train-dir", train_dir, "--split", args.final_split,
           "--valid-type", "once", "--best-metric", args.best_metric,
           "--device", args.train_device]
    )
    return train_cmd, eval_cmd, final_cmd


def main(argv=None) -> int:
    args = parse_args(argv)
    # Expand %DATE%/%USER%/%FIELD% placeholders ONCE so trainer and
    # evaluator share the same concrete directory.
    cfg = build_config(args)
    train_dir = cfg.train.train_dir
    Path(train_dir).mkdir(parents=True, exist_ok=True)
    print(f"[run_experiment] train_dir: {train_dir}", flush=True)

    train_cmd, eval_cmd, final_cmd = build_commands(args, train_dir)

    procs = []
    try:
        trainer = subprocess.Popen(train_cmd)
        procs.append(("trainer", trainer))
        evaluator = subprocess.Popen(eval_cmd)
        procs.append(("evaluator", evaluator))

        rc_train = trainer.wait()
        if rc_train != 0:
            print(f"[run_experiment] trainer failed rc={rc_train}", flush=True)
            evaluator.terminate()
            evaluator.wait(timeout=30)
            return rc_train
        # evaluator exits on its own once it has scored max_step (or after
        # the idle timeout as a safety net)
        rc_eval = evaluator.wait()
        if rc_eval != 0:
            print(f"[run_experiment] evaluator failed rc={rc_eval}", flush=True)
            return rc_eval
    finally:
        # trap 'pkill -P $$' parity: never leave children behind
        for name, proc in procs:
            if proc.poll() is None:
                print(f"[run_experiment] killing {name}", flush=True)
                proc.terminate()
                try:
                    proc.wait(timeout=30)
                except subprocess.TimeoutExpired:
                    proc.kill()

    if not args.final_split:
        return 0

    # Final held-out evaluation from the promoted best-valid checkpoint
    # (scripts/commands/*.sh:7 loads <train_dir>/valid/accuracy).
    return subprocess.call(final_cmd)


if __name__ == "__main__":
    raise SystemExit(main())

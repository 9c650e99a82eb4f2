"""Dataset prep tool: hash split determinism + tree building."""

import numpy as np

from tcresnet_tpu.data import wav as wavlib
from tools.prepare_dataset import main as prep_main, which_set


def test_which_set_deterministic_and_speaker_consistent():
    a = which_set("abc123_nohash_0.wav", 10, 10)
    b = which_set("abc123_nohash_1.wav", 10, 10)
    assert a == b  # same speaker -> same split
    assert a in ("train", "valid", "test")
    assert which_set("abc123_nohash_0.wav", 10, 10) == a  # stable


def test_prepare_builds_tree(tmp_path):
    src = tmp_path / "raw"
    rng = np.random.default_rng(0)
    # two keywords, one unknown word, noise
    for word in ["yes", "no", "cat"]:
        for i in range(6):
            wavlib.write_wav_pcm16(
                src / word / f"spk{i}_nohash_0.wav", rng.uniform(-0.5, 0.5, 1000)
            )
    wavlib.write_wav_pcm16(src / "_background_noise_" / "n.wav", rng.uniform(-0.3, 0.3, 4000))

    out = tmp_path / "out"
    prep_main([
        "--extracted", str(src), "--out", str(out),
        "--unknown-pct", "50", "--copy",
    ])

    wavs = sorted(str(p.relative_to(out)) for p in out.glob("*/*/*.wav"))
    assert wavs, "no files placed"
    labels = {p.split("/")[1] for p in wavs}
    assert labels <= {"yes", "no", "unknown", "_background_noise_"}
    # unknown files renamed word_file
    unknowns = [p for p in wavs if "/unknown/" in p]
    for u in unknowns:
        assert "cat_" in u
    # noise present in every built split
    for split_dir in out.iterdir():
        assert (split_dir / "_background_noise_" / "n.wav").exists()

    # deterministic: re-running places nothing new
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        prep_main(["--extracted", str(src), "--out", str(out), "--unknown-pct", "50", "--copy"])
    assert "Placed 0 files" in buf.getvalue()


def test_split_lists_source_layout(tmp_path, capsys):
    """The reference's SHIPPED lists use source-layout labels
    (bed/x.wav, _silence_/x.wav — speech_commands_dataset/train.txt):
    non-keywords must be remapped to unknown/<word>_<file>, silence rows
    counted (they are the reference's per-split --num_silent values) but
    not placed."""
    src = tmp_path / "raw"
    rng = np.random.default_rng(1)
    for word in ["yes", "bed"]:
        for i in range(2):
            wavlib.write_wav_pcm16(
                src / word / f"s{i}_nohash_0.wav", rng.uniform(-0.5, 0.5, 800)
            )

    lists = tmp_path / "lists"
    lists.mkdir()
    (lists / "train.txt").write_text(
        "yes/s0_nohash_0.wav\nbed/s0_nohash_0.wav\n_silence_/x_nohash_0.wav\n"
        "_silence_/x_nohash_0.wav\n"
    )
    (lists / "valid.txt").write_text("yes/s1_nohash_0.wav\n_silence_/y_nohash_0.wav\n")
    (lists / "test.txt").write_text("bed/s1_nohash_0.wav\n")

    out = tmp_path / "out"
    prep_main([
        "--extracted", str(src), "--out", str(out),
        "--split-lists", str(lists), "--copy",
    ])
    wavs = sorted(str(p.relative_to(out)) for p in out.glob("*/*/*.wav"))
    assert wavs == [
        "test/unknown/bed_s1_nohash_0.wav",
        "train/unknown/bed_s0_nohash_0.wav",
        "train/yes/s0_nohash_0.wav",
        "valid/yes/s1_nohash_0.wav",
    ]
    # silence rows reported per split (incl. duplicates, like the
    # reference's 1854/258/257), never placed
    outtxt = capsys.readouterr().out
    assert "'train': 2" in outtxt and "'valid': 1" in outtxt and "'test': 0" in outtxt


def test_split_lists_output_layout_roundtrip(tmp_path):
    """Output-layout lines (unknown/<word>_<file>) keep working."""
    src = tmp_path / "raw"
    rng = np.random.default_rng(2)
    wavlib.write_wav_pcm16(src / "cat" / "a_nohash_0.wav", rng.uniform(-0.5, 0.5, 800))
    lists = tmp_path / "lists"
    lists.mkdir()
    (lists / "train.txt").write_text("unknown/cat_a_nohash_0.wav\n")
    (lists / "valid.txt").write_text("")
    (lists / "test.txt").write_text("")
    out = tmp_path / "out"
    prep_main([
        "--extracted", str(src), "--out", str(out),
        "--split-lists", str(lists), "--copy",
    ])
    assert (out / "train" / "unknown" / "cat_a_nohash_0.wav").exists()

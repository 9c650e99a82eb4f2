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

"""Orchestration script tests (reference create_taskfiles.sh,
run_waspaa2017.sh, score_audio.sh equivalents)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = os.path.join(REPO, "scripts")
ENV = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)


def run(args, cwd):
    return subprocess.run(
        [sys.executable] + args, cwd=cwd, env=ENV,
        capture_output=True, text=True, timeout=600,
    )


def test_create_taskfiles(tmp_path):
    # fake CHiME2 layout
    for tree in ("isolated", "scaled"):
        for subset in ("si_tr_s", "si_dt_05", "si_et_05"):
            d = tmp_path / "chime2" / tree / subset / "0dB"
            d.mkdir(parents=True)
            for i in range(2):
                (d / f"utt{i}.wav").write_bytes(b"RIFF")
    r = run([os.path.join(SCRIPTS, "create_taskfiles.py"),
             str(tmp_path / "chime2"), "--out-dir", str(tmp_path)], str(tmp_path))
    assert r.returncode == 0, r.stderr
    for split in ("train", "valid", "test"):
        for cond in ("noisy", "clean"):
            tf = tmp_path / f"taskfile_chime2_{split}_{cond}.txt"
            lines = tf.read_text().splitlines()
            assert len(lines) == 2
            assert lines == sorted(lines)


def test_run_waspaa2017_generate_only(tmp_path):
    r = run([os.path.join(SCRIPTS, "run_waspaa2017.py"), "--generate-only"],
            str(tmp_path))
    assert r.returncode == 0, r.stderr
    for ds in (10, 1):
        setup = tmp_path / f"data_setup_downsample{ds}"
        assert (setup / "params_data.yaml").is_file()
        cfgs = os.listdir(setup / "configs")
        assert len(cfgs) == 10
        assert sum(c.startswith("params_unfolded_snmf_") for c in cfgs) == 4
        assert sum(c.startswith("params_lstm_") for c in cfgs) == 4
        assert sum(c.startswith("params_snmf_") for c in cfgs) == 2
    # hashed names are deterministic across the two setups
    a = sorted(os.listdir(tmp_path / "data_setup_downsample1" / "configs"))
    b = sorted(os.listdir(tmp_path / "data_setup_downsample10" / "configs"))
    assert a == b


def test_score_audio_taskfiles(tmp_path, rng):
    from drnmf_tpu.dsp import wavwrite

    enh_list, ref_list = [], []
    for i in range(2):
        ref = rng.standard_normal(8000).astype(np.float32) * 0.1
        enh = ref + rng.standard_normal(8000).astype(np.float32) * 0.01
        rp, ep = tmp_path / f"ref{i}.wav", tmp_path / f"enh{i}.wav"
        wavwrite(str(rp), 16000, ref[None])
        wavwrite(str(ep), 16000, enh[None])
        ref_list.append(str(rp))
        enh_list.append(str(ep))
    (tmp_path / "ref.txt").write_text("\n".join(ref_list) + "\n")
    (tmp_path / "enh.txt").write_text("\n".join(enh_list) + "\n")
    save = tmp_path / "scores.npz"
    r = run([os.path.join(SCRIPTS, "score_audio.py"),
             "--enh", str(tmp_path / "enh.txt"),
             "--ref", str(tmp_path / "ref.txt"),
             "--savefile", str(save)], str(tmp_path))
    assert r.returncode == 0, r.stderr
    assert "mean SDR" in r.stdout
    S = np.load(save)["S"]
    assert S.shape == (2, 6)
    assert np.all(S[:, 0] > 10)  # near-clean estimates: high SDR


def test_score_audio_length_mismatch(tmp_path):
    (tmp_path / "enh.txt").write_text("a.wav\nb.wav\n")
    (tmp_path / "ref.txt").write_text("a.wav\n")
    r = run([os.path.join(SCRIPTS, "score_audio.py"),
             "--enh", str(tmp_path / "enh.txt"),
             "--ref", str(tmp_path / "ref.txt")], str(tmp_path))
    assert r.returncode == 2
    assert "mismatch" in r.stderr


def test_print_scores_empty(tmp_path):
    r = run([os.path.join(SCRIPTS, "print_scores.py"), str(tmp_path)],
            str(tmp_path))
    assert r.returncode != 0
    assert "no configs" in r.stderr


def test_print_scores_per_snr(tmp_path):
    """--per-snr prints the m6dB..9dB breakdown per model from the per-SNR
    score files (reference print_scores.py:93-100)."""
    import yaml

    exp = tmp_path / "exp"
    (exp / "configs").mkdir(parents=True)
    (exp / "scores").mkdir()
    tag = "unfolded_snmf_abc123"
    with open(exp / "configs" / f"params_{tag}.yaml", "w") as f:
        yaml.safe_dump({"K_layers": 2, "r": 8}, f)
    rng = np.random.default_rng(0)
    for snr, base in [("m6dB", 4.0), ("0dB", 7.0), ("9dB", 11.0)]:
        S = np.zeros((3, 6))
        S[:, 0] = base + rng.uniform(-0.1, 0.1, 3)
        np.savez(exp / "scores" / f"scores_{tag}_valid_{snr}.npz", S=S)
    r = run([os.path.join(SCRIPTS, "print_scores.py"), str(exp),
             "--per-snr", "--splits", "valid"], str(tmp_path))
    assert r.returncode == 0, r.stderr
    out = r.stdout
    assert "m6dB" in out and "9dB" in out
    line = next(l for l in out.splitlines() if tag in l)
    cols = line.split()
    # m6dB ~4.0, missing conditions print '-', 9dB ~11.0
    assert abs(float(cols[1]) - 4.0) < 0.2
    assert cols[2] == "-"  # m3dB has no score file
    assert abs(float(cols[6]) - 11.0) < 0.2


def test_print_scores_both_conditions(tmp_path):
    """Several experiment dirs print ONE combined table with a per-row
    num_train column (reference print_scores.py:34's both-data-conditions
    layout), conditions paired per model with full data first and sizes
    ordered numerically."""
    import yaml

    wavs = tmp_path / "wavs.txt"
    wavs.write_text("\n".join(f"f{i}.wav" for i in range(40)) + "\n")
    for ds, name in [(1, "exp1"), (10, "exp10")]:
        exp = tmp_path / name
        (exp / "configs").mkdir(parents=True)
        (exp / "scores").mkdir()
        with open(exp / "params_data.yaml", "w") as f:
            yaml.safe_dump({"downsample": ds,
                            "taskfile_x_train": str(wavs)}, f)
        for r_dim in (64, 512):  # 512 must sort after 64 (not lexically)
            tag = f"unfolded_snmf_h{r_dim}"
            with open(exp / "configs" / f"params_{tag}.yaml", "w") as f:
                yaml.safe_dump({"K_layers": 2, "r": r_dim}, f)
            S = np.zeros((2, 6))
            S[:, 0] = 5.0 + r_dim / 100 + (0 if ds == 1 else -1)
            np.savez(exp / "scores" / f"scores_{tag}_valid_0dB.npz", S=S)
    r = run([os.path.join(SCRIPTS, "print_scores.py"),
             str(tmp_path / "exp1"), str(tmp_path / "exp10"),
             "--splits", "valid"], str(tmp_path))
    assert r.returncode == 0, r.stderr
    rows = [l.split() for l in r.stdout.splitlines()
            if l.startswith("unfolded_snmf")]
    # (N, num_train) pairing: 128-dim pair (full data first), then 1024
    assert [(c[2], c[4]) for c in rows] == [
        ("128", "40"), ("128", "4"), ("1024", "40"), ("1024", "4")]


def test_run_waspaa2017_smoke_generate(tmp_path):
    r = run([os.path.join(SCRIPTS, "run_waspaa2017.py"), "--smoke",
             "--generate-only"], str(tmp_path))
    assert r.returncode == 0, r.stderr
    cfgs = os.listdir(tmp_path / "data_setup_downsample10" / "configs")
    assert len(cfgs) == 3  # one per model family


def test_enhance_wav_missing_model(tmp_path):
    import yaml
    cfg = tmp_path / "params_unfolded_snmf_x.yaml"
    yaml.safe_dump({"r": 4, "K_layers": 2, "alph": 10.0, "lam1": 0.5},
                   open(cfg, "w"))
    r = run([os.path.join(SCRIPTS, "enhance_wav.py"), "-c", str(cfg),
             "-m", str(tmp_path / "none.npz"), "in.wav",
             "-o", str(tmp_path / "out.wav")], str(tmp_path))
    assert r.returncode == 2
    assert "checkpoint not found" in r.stderr


def test_serve_connection_rejects_oversize_chunk():
    """A single client message cannot demand an unbounded recv buffer
    (ADVICE r2): oversize lengths error out instead of allocating."""
    import socket
    import struct
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import serve

    a, b = socket.socketpair()
    try:
        a.sendall(struct.pack("<i", 2**30))

        class DummyEnh:
            def process(self, x):
                return x

            def flush(self):
                return []

        with pytest.raises(ValueError, match="cap"):
            serve.serve_connection(b, DummyEnh, timeout=5.0)
    finally:
        a.close()
        b.close()


def test_run_waspaa2017_cli_args_passthrough(tmp_path):
    """--cli-args forwards extra flags (e.g. parallelism) verbatim to every
    grid run's drnmf_tpu.cli invocation."""
    r = run([os.path.join(SCRIPTS, "run_waspaa2017.py"), "--smoke",
             "--dry-run", "--cli-args", "--dp 4 --fsdp"], str(tmp_path))
    assert r.returncode == 0, r.stderr
    run_lines = [l for l in r.stdout.splitlines() if l.startswith("== run:")]
    assert run_lines
    assert all("--dp 4 --fsdp" in l for l in run_lines)

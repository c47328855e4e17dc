"""Metrics engine tests.

SDR is validated against a float64 numpy transcription of the BSS Eval 3.0
projection (the golden oracle), plus analytic cases.  SNR/SegSNR/STOI/PESQ
are validated on analytic and monotonicity properties.
"""

import numpy as np
import pytest

from drnmf_tpu.metrics import bss_eval_sdr, snr, snrseg, stoi, pesq_16k


def ref_sdr_f64(se, s, flen=512):
    """float64 numpy transcription of bss_eval_sources' single-source
    projection (the decomposition behind score_audio.m:206)."""
    import scipy.linalg

    n = len(se)
    nfft = 1 << (n + flen - 1).bit_length()
    sf = np.fft.rfft(s, nfft)
    sef = np.fft.rfft(se, nfft)
    r = np.fft.irfft(sf * np.conj(sf), nfft)[:flen]
    c = np.fft.irfft(sef * np.conj(sf), nfft)[:flen]
    R = scipy.linalg.toeplitz(r)
    h = np.linalg.solve(R + 1e-12 * r[0] * np.eye(flen), c)
    s_target = np.fft.irfft(np.fft.rfft(h, nfft) * sf, nfft)[: n + flen - 1]
    e = np.concatenate([se, np.zeros(flen - 1)]) - s_target
    return 10 * np.log10(np.sum(s_target**2) / np.sum(e**2))


def _speechlike(rng, n=16000):
    t = np.arange(n) / 16000
    x = np.zeros(n)
    for f0, a in [(180, 1.0), (360, 0.6), (540, 0.4), (1200, 0.2)]:
        x += a * np.sin(2 * np.pi * f0 * t + rng.uniform(0, 2 * np.pi))
    env = 0.5 * (1 + np.sin(2 * np.pi * 3 * t))
    return (x * env * 0.1).astype(np.float32)


def test_sdr_matches_f64_oracle(rng):
    s = _speechlike(rng)
    noise = 0.05 * rng.standard_normal(len(s)).astype(np.float32)
    se = s + noise
    ours = bss_eval_sdr(se, s)
    golden = ref_sdr_f64(se.astype(np.float64), s.astype(np.float64))
    assert abs(ours - golden) < 0.05, (ours, golden)


def test_sdr_perfect_reconstruction_is_high(rng):
    s = _speechlike(rng)
    assert bss_eval_sdr(s, s) > 40.0


def test_sdr_scaling_invariant_through_projection(rng):
    """A pure gain is absorbed by the projection filter -> very high SDR."""
    s = _speechlike(rng)
    assert bss_eval_sdr(0.5 * s, s) > 40.0


def test_sdr_filtered_estimate_absorbed(rng):
    """A short FIR distortion (< 512 taps) lies in the projection subspace."""
    s = _speechlike(rng)
    taps = np.array([0.8, 0.1, -0.05, 0.02], np.float32)
    se = np.convolve(s, taps, mode="full")[: len(s)].astype(np.float32)
    assert bss_eval_sdr(se, s) > 35.0


def test_sdr_monotone_in_noise(rng):
    s = _speechlike(rng)
    noise = rng.standard_normal(len(s)).astype(np.float32)
    sdrs = [bss_eval_sdr(s + g * noise, s) for g in (0.01, 0.03, 0.1)]
    assert sdrs[0] > sdrs[1] > sdrs[2]


def test_snr_analytic():
    ref = np.ones(1000, np.float32)
    est = ref + 0.1
    # SNR = 10log10(1000 / (1000*0.01)) = 20 dB
    assert abs(snr(est, ref) - 20.0) < 1e-3


def test_snrseg_range_and_monotone(rng):
    s = _speechlike(rng)
    n1 = s + 0.01 * rng.standard_normal(len(s)).astype(np.float32)
    n2 = s + 0.2 * rng.standard_normal(len(s)).astype(np.float32)
    l1, g1 = snrseg(n1, s)
    l2, g2 = snrseg(n2, s)
    assert l1 > l2 and g1 > g2
    assert -10.0 <= l1 <= 35.0 and -10.0 <= l2 <= 35.0


def test_stoi_identity_and_monotone(rng):
    s = _speechlike(rng, n=32000)
    noise = rng.standard_normal(len(s)).astype(np.float32)
    clean_score = stoi(s, s)
    assert clean_score > 0.99
    s1 = stoi(s, s + 0.05 * noise)
    s2 = stoi(s, s + 0.5 * noise)
    assert clean_score >= s1 > s2


def test_fused_device_metrics_match_individual(rng):
    """The single-dispatch SDR+SNR+SegSNR program == the individual
    kernels (the scoring engine's per-file dispatch-latency optimization)."""
    from drnmf_tpu.metrics.fused import fused_device_metrics

    s = _speechlike(rng, n=23000)
    noise = 0.1 * rng.standard_normal(len(s)).astype(np.float32)
    est = s + noise
    sdr_f, snr_f, loc_f, glo_f = fused_device_metrics(est, s, 16000)
    assert abs(sdr_f - bss_eval_sdr(est, s)) < 1e-3
    assert abs(snr_f - snr(est, s)) < 1e-3
    loc, glo = snrseg(est, s, 16000)
    assert abs(loc_f - loc) < 1e-3
    assert abs(glo_f - glo) < 1e-3


def test_pesq_identity_and_monotone(rng):
    s = _speechlike(rng, n=32000)
    noise = rng.standard_normal(len(s)).astype(np.float32)
    clean = pesq_16k(s, s)
    assert clean > 4.3
    p1 = pesq_16k(s, s + 0.02 * noise)
    p2 = pesq_16k(s, s + 0.3 * noise)
    assert clean >= p1 > p2
    assert pesq_16k(s, s, compute=False) == -1.0


def test_score_taskfiles_and_cache(tmp_path, rng):
    from drnmf_tpu.metrics import score_taskfiles, SCORE_LABELS
    from drnmf_tpu.dsp import wavwrite

    s = _speechlike(rng)
    pairs = []
    for i in range(3):
        ref_p = str(tmp_path / f"ref{i}.wav")
        est_p = str(tmp_path / f"est{i}.wav")
        noise = 0.05 * rng.standard_normal(len(s)).astype(np.float32)
        wavwrite(ref_p, 16000, s[None])
        wavwrite(est_p, 16000, (s + noise)[None])
        pairs.append((est_p, ref_p))

    save = str(tmp_path / "scores.npz")
    S, labels = score_taskfiles([p[0] for p in pairs], [p[1] for p in pairs],
                                savefile=save)
    assert S.shape == (3, 6)
    assert labels == SCORE_LABELS
    assert np.all(np.isfinite(S[:, [0, 1, 2, 3, 5]]))
    # cache hit returns identical scores
    S2, _ = score_taskfiles([p[0] for p in pairs], [p[1] for p in pairs],
                            savefile=save)
    np.testing.assert_array_equal(S, S2)


def test_score_taskfiles_native_matches_scipy_path(tmp_path, rng):
    """The native-batch-decode scoring path produces the same scores as the
    per-file scipy path."""
    import numpy as np
    from drnmf_tpu.dsp import wavwrite
    from drnmf_tpu.metrics import scoring
    from drnmf_tpu.data.native_loader import native_available

    if not native_available():
        import pytest
        pytest.skip("native loader unavailable")

    enh, ref = [], []
    for i in range(3):
        x = (rng.standard_normal(6000) * 0.1).astype(np.float32)
        y = x + (rng.standard_normal(6000) * 0.02).astype(np.float32)
        rp, ep = str(tmp_path / f"r{i}.wav"), str(tmp_path / f"e{i}.wav")
        wavwrite(rp, 16000, x[None])
        wavwrite(ep, 16000, y[None])
        ref.append(rp)
        enh.append(ep)

    S_native, _ = scoring.score_taskfiles(enh, ref)
    # force the scipy path
    import unittest.mock as mock
    with mock.patch("drnmf_tpu.data.native_loader.native_available",
                    return_value=False):
        S_scipy, _ = scoring.score_taskfiles(enh, ref)
    np.testing.assert_allclose(S_native, S_scipy, rtol=1e-5, atol=1e-5)


def test_metric_kernels_compile_count_bounded(rng):
    """Scoring a corpus of arbitrary lengths compiles O(log n) programs, not
    one per distinct length (pow2 bucketing in snrseg/stoi/bss_eval)."""
    from drnmf_tpu.metrics.snr import _snrseg_padded, snrseg
    from drnmf_tpu.metrics.stoi import _stoi_from_envelopes, stoi
    from drnmf_tpu.metrics.bss_eval import _sdr_padded, bss_eval_sdr

    lengths = [6001, 6007, 6103, 6500, 7001, 7333, 7901, 9000, 11111, 12345]
    for n in lengths:
        x = (rng.standard_normal(n) * 0.2).astype(np.float32)
        y = x + (rng.standard_normal(n) * 0.02).astype(np.float32)
        snrseg(y, x, 16000)
        stoi(x, y, 16000)
        bss_eval_sdr(y, x)
    # 10 distinct lengths spanning ~2x must not mean 10 compiles each
    assert _snrseg_padded._cache_size() <= 3
    assert _stoi_from_envelopes._cache_size() <= 4
    assert _sdr_padded._cache_size() <= 3


def test_bss_eval_sdr_many_matches_per_file(rng):
    ests, refs = [], []
    for n in (5000, 7000, 7100, 13000):
        x = (rng.standard_normal(n) * 0.2).astype(np.float32)
        refs.append(x)
        ests.append(x + (rng.standard_normal(n) * 0.05).astype(np.float32))
    from drnmf_tpu.metrics.bss_eval import bss_eval_sdr_many

    many = bss_eval_sdr_many(ests, refs)
    single = [bss_eval_sdr(e, r) for e, r in zip(ests, refs)]
    np.testing.assert_allclose(many, single, rtol=1e-5, atol=1e-4)


def test_snrseg_batch_matches_per_file(rng):
    from drnmf_tpu.metrics.snr import snrseg_batch

    lens = [5000, 7000, 8000]
    target = 16000
    e = np.zeros((3, target), np.float32)
    r = np.zeros((3, target), np.float32)
    for i, n in enumerate(lens):
        r[i, :n] = (rng.standard_normal(n) * 0.2).astype(np.float32)
        e[i, :n] = r[i, :n] + (rng.standard_normal(n) * 0.05).astype(np.float32)
    loc_b, glo_b = snrseg_batch(e, r, lens)
    for i, n in enumerate(lens):
        loc, glo = snrseg(e[i, :n], r[i, :n])
        assert abs(loc_b[i] - loc) < 1e-4
        assert abs(glo_b[i] - glo) < 1e-4


def test_pesq_snr_anchor_curve(rng):
    """PESQ model vs published speech+white-noise MOS-vs-SNR anchors
    (P.862-structured model; tolerance 0.15 MOS)."""
    fs = 16000
    r = np.random.default_rng(3)
    t = np.arange(fs * 4) / fs
    f0 = 140 * (1 + 0.1 * np.sin(2 * np.pi * 2.1 * t))
    phase = 2 * np.pi * np.cumsum(f0) / fs
    x = sum(a * np.sin(k * phase)
            for k, a in [(1, 1.0), (2, 0.6), (3, 0.4), (4, 0.25)])
    env = np.clip(np.sin(2 * np.pi * 1.7 * t), 0, None)
    x = (x * env * 0.1).astype(np.float32)

    anchors = {0: 1.2, 10: 1.8, 20: 2.6, 30: 3.5}
    prev = 0.0
    for snr_db, target in sorted(anchors.items()):
        noise = r.standard_normal(len(x)).astype(np.float32)
        noise *= np.sqrt(np.mean(x**2) / np.mean(noise**2) / 10**(snr_db / 10))
        mos = pesq_16k(x, x + noise)
        assert abs(mos - target) < 0.15, (snr_db, mos, target)
        assert mos > prev  # monotone in SNR
        prev = mos
    assert pesq_16k(x, x) > 4.3  # clean ~= 4.4-4.5


def test_fused_metrics_packed_matches_per_file(rng):
    """Packed-transfer batched device metrics == per-file fused metrics,
    including files whose near-periodic references need the escalating
    Toeplitz ridge (the packed path escalates at bucket granularity) and
    lengths spanning multiple pow2 FFT buckets."""
    import numpy as np
    from drnmf_tpu.metrics.fused import (
        fused_device_metrics, fused_metrics_packed)

    fs = 16000
    pairs = []
    for i in range(7):
        n = int(fs * (0.3 + 0.35 * i))  # spans several pow2 buckets
        t = np.arange(n) / fs
        if i % 2 == 0:
            # pure-ish sine: rank-deficient reference -> ridge escalation
            ref = (0.1 * np.sin(2 * np.pi * (100 + 20 * i) * t)).astype(
                np.float32)
        else:
            ref = (0.05 * rng.standard_normal(n)).astype(np.float32)
        est = ref + 0.01 * rng.standard_normal(n).astype(np.float32)
        pairs.append((est, ref))

    per_file = np.array([fused_device_metrics(e, r, fs) for e, r in pairs])
    packed = fused_metrics_packed([p[0] for p in pairs],
                                  [p[1] for p in pairs], fs)
    assert np.all(np.isfinite(packed))
    np.testing.assert_allclose(packed, per_file, rtol=1e-4, atol=1e-3)


def test_fused_packed_degenerate_reference_matches_per_file():
    """References that stay rank-deficient at the largest ridge take the
    same exact per-file SDR fallback in the packed path as in
    fused_device_metrics (ADVICE r2: no NaN divergence between paths)."""
    from drnmf_tpu.metrics.fused import fused_device_metrics, fused_metrics_packed

    rng = np.random.default_rng(5)
    fs = 16000
    t = np.arange(4000)
    # a pure sinusoid reference is near-rank-deficient for the 512-tap
    # Toeplitz solve; include healthy signals around it
    sine = np.sin(2 * np.pi * 440.0 * t / fs).astype(np.float32)
    refs = [rng.standard_normal(3000).astype(np.float32), sine,
            rng.standard_normal(5000).astype(np.float32)]
    ests = [r + 0.1 * rng.standard_normal(len(r)).astype(np.float32)
            for r in refs]

    packed = fused_metrics_packed(ests, refs, fs)
    for i in range(len(refs)):
        per_file = fused_device_metrics(ests[i], refs[i], fs)
        np.testing.assert_allclose(packed[i], np.asarray(per_file),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"file {i}")

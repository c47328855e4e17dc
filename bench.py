"""Benchmark: enhancement real-time factor per chip.

Runs the complete DR-NMF enhancement compute path -- STFT featurization,
K-layer unfolded-ISTA recurrence over time, Wiener-style ratio mask, masked
iSTFT reconstruction -- as one jit'd on-device program over a batch of
utterances, and reports audio-seconds processed per wall-second.

North star (BASELINE.md): > 100x real-time per TPU v5e chip on the flagship
model (DR-NMF K=5, hidden 2r=2000, F=257, 16 kHz, N=512/hop=128 STFT).
Prints one JSON line: value = real-time factor, vs_baseline = value / 100.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from drnmf_tpu.dsp import sqrt_hann_periodic
    from drnmf_tpu.dsp.stft import stft_frames, istft_frames, pad_signal
    from drnmf_tpu.models import DRNMFConfig, init_drnmf_params
    from drnmf_tpu.models.drnmf import drnmf_forward

    fs = 16000
    n_fft, hop = 512, 128
    # B=128 fills the MXU's 128-row systolic dimension (measured 4x the
    # per-audio-second throughput of B=32 on v5e); 1024 s of audio per step
    batch, seconds = 128, 8.0
    nsampl = int(fs * seconds)

    config = DRNMFConfig(
        input_dim=257, r=1000, output_dim=257, K_layers=5,
        alph=400.0, lam1=1.0,
        params_untied=("log_D", "log_alph"),
        params_trainable=("log_D", "log_alph"),
    )
    rng = np.random.default_rng(7654)
    w_dict = rng.uniform(0.01, 1.0, (257, 2000)).astype(np.float32)
    w_dict /= np.sqrt(np.sum(w_dict**2, axis=0))
    params = init_drnmf_params(config, w_dict)

    window = jnp.asarray(sqrt_hann_periodic(n_fft))

    def enhance(params, wav):  # wav: (B, nsampl)
        spec = stft_frames(wav, window, n_fft, hop)  # (B, T, F) complex
        mag = jnp.abs(spec)
        irm = drnmf_forward(params, config, mag)
        out = istft_frames(spec * irm.astype(jnp.complex64), window, n_fft, hop)
        return out

    enhance_jit = jax.jit(enhance)

    # generate the test signal ON DEVICE: host->device transfers ride a slow
    # tunnel under axon and would dominate setup (not measurement) time
    key = jax.random.PRNGKey(0)
    wav_dev = pad_signal(
        0.1 * jax.random.normal(key, (batch, nsampl), jnp.float32), n_fft, hop
    )
    params_dev = jax.device_put(params)

    # warmup / compile
    jax.block_until_ready(enhance_jit(params_dev, wav_dev))

    n_iter = 5
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = enhance_jit(params_dev, wav_dev)
    jax.block_until_ready(out)
    wall = (time.perf_counter() - t0) / n_iter

    audio_seconds = batch * seconds
    rtf = audio_seconds / wall
    print(
        json.dumps(
            {
                "metric": "drnmf_enhance_rtf_per_chip",
                "value": round(rtf, 2),
                "unit": "x_realtime",
                "vs_baseline": round(rtf / 100.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()

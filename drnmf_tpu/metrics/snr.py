"""SNR and segmental SNR.

* ``snr``: raw SNR, exactly the reference's formula (score_audio.m:209):
  ``10 log10( sum(ref^2) / sum((ref-est)^2) )``.

* ``snrseg``: segmental SNR in the voicebox ``snrseg(est, ref, fs)`` role
  (score_audio.m:212).  The voicebox toolbox is external to the reference
  repo (fetched by download_toolboxes.sh), so this is the classical NIST-style
  definition: non-overlapping 10 ms frames, per-frame SNR
  ``10 log10(sum r^2 / sum (s-r)^2)`` clamped to [-10, 35] dB (the standard
  perceptual limits), with

  - 'local'  = mean of clamped per-frame SNRs over *active* frames (frame
    energy within 40 dB of the loudest reference frame -- a simple VAD, as
    voicebox's default 'V' mode uses), and
  - 'global' = 10 log10 of summed signal/noise energies over active frames.

Both run as one jit'd program; frame selection is mask-weighted (static
shapes, no host round-trips).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

SEG_MIN_DB = -10.0
SEG_MAX_DB = 35.0
VAD_RANGE_DB = 40.0


def snr(est, ref) -> float:
    est = np.asarray(est, np.float64).ravel()
    ref = np.asarray(ref, np.float64).ravel()
    n = min(len(est), len(ref))
    est, ref = est[:n], ref[:n]
    den = np.sum((ref - est) ** 2)
    return float(10.0 * np.log10(np.sum(ref**2) / max(den, 1e-30)))


@partial(jax.jit, static_argnames=("frame_len",))
def _snrseg_padded(est, ref, n_valid, frame_len):
    n_frames = est.shape[-1] // frame_len
    e = est[: n_frames * frame_len].reshape(n_frames, frame_len)
    r = ref[: n_frames * frame_len].reshape(n_frames, frame_len)
    t0 = jnp.arange(n_frames) * frame_len
    full = (t0 + frame_len) <= n_valid  # only complete, in-range frames

    sig = jnp.sum(r * r, axis=1)
    noi = jnp.sum((r - e) ** 2, axis=1)

    # energy VAD relative to the loudest valid reference frame
    peak = jnp.max(jnp.where(full, sig, 0.0))
    active = jnp.logical_and(full, sig > peak * 10.0 ** (-VAD_RANGE_DB / 10.0))

    frame_snr = 10.0 * jnp.log10(
        jnp.maximum(sig, 1e-30) / jnp.maximum(noi, 1e-30)
    )
    frame_snr = jnp.clip(frame_snr, SEG_MIN_DB, SEG_MAX_DB)

    w = active.astype(jnp.float32)
    local = jnp.sum(frame_snr * w) / jnp.maximum(jnp.sum(w), 1.0)
    glo = 10.0 * jnp.log10(
        jnp.maximum(jnp.sum(sig * w), 1e-30) / jnp.maximum(jnp.sum(noi * w), 1e-30)
    )
    return local, glo


def snrseg_batch(est_p, ref_p, lengths, fs: int = 16000, tf: float = 0.01):
    """Vmapped segmental SNR over a padded batch.

    est_p/ref_p: (B, total) zero-padded with total a frame_len multiple;
    lengths: (B,) true lengths.  Returns (local (B,), global (B,))."""
    frame_len = int(round(tf * fs))
    fn = jax.vmap(partial(_snrseg_padded, frame_len=frame_len))
    local, glo = fn(jnp.asarray(est_p), jnp.asarray(ref_p),
                    jnp.asarray(lengths, jnp.int32))
    return np.asarray(local), np.asarray(glo)


def snrseg(est, ref, fs: int = 16000, tf: float = 0.01):
    """Returns (local, global) segmental SNR in dB.

    Signals are zero-padded to power-of-two length buckets so a corpus of
    arbitrary utterance lengths compiles O(log n) programs instead of one
    per distinct length (the kernel masks frames past ``n_valid``)."""
    est = np.asarray(est, np.float32).ravel()
    ref = np.asarray(ref, np.float32).ravel()
    n = min(len(est), len(ref))
    frame_len = int(round(tf * fs))
    target = 1 << max(int(n - 1).bit_length(), 1)
    target += (-target) % frame_len
    est_p = jnp.asarray(np.pad(est[:n], (0, target - n)))
    ref_p = jnp.asarray(np.pad(ref[:n], (0, target - n)))
    local, glo = _snrseg_padded(est_p, ref_p, jnp.int32(n), frame_len)
    return float(local), float(glo)

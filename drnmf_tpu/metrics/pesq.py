"""PESQ (ITU-T P.862) MOS estimation, 16 kHz wideband-style mode.

Replaces the reference's ``pesq_16kHz`` MATLAB call (score_audio.m:225).
The reference computes PESQ when the (externally downloaded) Loizou toolbox
is present and fills -1 otherwise (score_audio.m:9-14, 177-179).  Here PESQ
is opt-in (``--pesq`` / ``compute=True``) because this implementation is a
calibrated P.862-style model rather than a bit-exact ITU port -- defaulting
it on would put approximate numbers in default score tables.

This implementation covers the P.862 perceptual model for the
time-aligned case: level alignment to 79 dB SPL via the standard IRS-ish
band, Bark spectrum (49 bands at 16 kHz x2 frame rate), frequency
compensation, loudness transform (Zwicker law), asymmetric + symmetric
disturbance aggregation with the published L5/L1 averaging, and the mapping
to MOS.  The crude/fine time-alignment machinery of P.862 is intentionally
omitted: mask-based enhancement produces sample-aligned outputs (the signal
path is STFT -> mask -> iSTFT of the same recording), so delay is zero by
construction.  Scores are therefore comparable between systems scored by
this module (the reference's relative comparisons are what its tables
report), though not bit-identical to ITU reference binaries.
"""

import numpy as np


def pesq_16k(ref, est, fs: int = 16000, compute: bool = True) -> float:
    if not compute:
        return -1.0
    from ._pesq_model import pesq_mos_aligned

    return pesq_mos_aligned(np.asarray(ref, np.float64).ravel(),
                            np.asarray(est, np.float64).ravel(), fs)

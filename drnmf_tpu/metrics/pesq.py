"""PESQ (ITU-T P.862) MOS estimation, 16 kHz mode.

Replaces the reference's ``pesq_16kHz`` MATLAB call (score_audio.m:225),
which the reference computed by default on every scored file (filling -1
only when the externally downloaded Loizou toolbox was missing,
score_audio.m:9-14, 177-179).  PESQ is likewise computed by default here;
pass ``compute=False`` (CLI ``--no-pesq``) to skip it.

The implementation (``_pesq_model``) follows the P.862 perceptual model
structurally -- standard 49-band Bark layout, per-band absolute-threshold
table, partial frequency + smoothed gain compensation, modified Zwicker
loudness, deadzone and asymmetry gates, frame emphasis and 45-caps,
L6/L2 time aggregation, and the standard's linear MOS map -- for the
time-aligned case.  The crude/fine time-alignment machinery of P.862 is
intentionally omitted: mask-based enhancement produces sample-aligned
outputs (the signal path is STFT -> mask -> iSTFT of the same recording),
so delay is zero by construction.  Three scalar normalization constants
are calibrated against published speech+white-noise MOS-vs-SNR anchors to
within 0.15 MOS (see _pesq_model docstring); scores land on the published
MOS scale and are comparable between systems scored by this module, though
not bit-identical to ITU reference binaries.
"""

import numpy as np


def pesq_16k(ref, est, fs: int = 16000, compute: bool = True) -> float:
    if not compute:
        return -1.0
    from ._pesq_model import pesq_mos_aligned

    return pesq_mos_aligned(np.asarray(ref, np.float64).ravel(),
                            np.asarray(est, np.float64).ravel(), fs)

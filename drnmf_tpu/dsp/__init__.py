from .windows import hann_periodic, sqrt_hann_periodic
from .stft import (
    stft,
    istft,
    stft_frames,
    overlap_add,
    n_frames_for_length,
    padded_length,
)
from .wav import wavread, wavwrite

__all__ = [
    "hann_periodic",
    "sqrt_hann_periodic",
    "stft",
    "istft",
    "stft_frames",
    "overlap_add",
    "n_frames_for_length",
    "padded_length",
    "wavread",
    "wavwrite",
]

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
from .phase import aug_stft, iaug_stft, remove_hop_phase, add_hop_phase

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
    "aug_stft",
    "iaug_stft",
    "remove_hop_phase",
    "add_hop_phase",
]

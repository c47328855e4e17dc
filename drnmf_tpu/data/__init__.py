from .dataset import AudioDataset, compute_stfts, clip_x_to_y
from .batching import (
    get_mask_value,
    make_transform,
    reshape_and_pad_stacks,
    masked_seqs_to_frames,
    pad_axis_to_n,
    load_split,
)
from .synthetic import make_synthetic_corpus

__all__ = [
    "AudioDataset",
    "compute_stfts",
    "clip_x_to_y",
    "get_mask_value",
    "make_transform",
    "reshape_and_pad_stacks",
    "masked_seqs_to_frames",
    "pad_axis_to_n",
    "load_split",
    "make_synthetic_corpus",
]

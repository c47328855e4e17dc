from .align import align_pair, estimate_delay, split_utterances
from .bss_eval import bss_eval_sdr
from .snr import snr, snrseg
from .stoi import stoi
from .pesq import pesq_16k
from .scoring import compute_scores, score_taskfiles, SCORE_LABELS

__all__ = [
    "align_pair",
    "estimate_delay",
    "split_utterances",
    "bss_eval_sdr",
    "snr",
    "snrseg",
    "stoi",
    "pesq_16k",
    "compute_scores",
    "score_taskfiles",
    "SCORE_LABELS",
]

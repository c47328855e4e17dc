from .snmf import SNMFParams, SNMFResult, sparse_nmf, sparse_nmf_chunked
from .ista import ista, ista_ed, ista_kl, ista_beta, kl_div, beta_div

__all__ = [
    "SNMFParams",
    "SNMFResult",
    "sparse_nmf",
    "sparse_nmf_chunked",
    "ista",
    "ista_ed",
    "ista_kl",
    "ista_beta",
    "kl_div",
    "beta_div",
]

from .drnmf_scan import (
    drnmf_scan_pallas,
    drnmf_scan_pallas_factored,
    pallas_scan_supported,
)

__all__ = ["drnmf_scan_pallas", "drnmf_scan_pallas_factored",
           "pallas_scan_supported"]

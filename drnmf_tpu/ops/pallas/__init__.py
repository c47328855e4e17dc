from .drnmf_scan import drnmf_scan_pallas, pallas_scan_supported

__all__ = ["drnmf_scan_pallas", "pallas_scan_supported"]

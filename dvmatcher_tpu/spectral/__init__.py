from dvmatcher_tpu.spectral.laplacian import cotan_laplacian, lbo_eigenbasis
from dvmatcher_tpu.spectral.wks import auto_wks, wks
from dvmatcher_tpu.spectral.fmap import fmap_to_pmap, pmap_to_fmap, zoomout

__all__ = [
    "cotan_laplacian",
    "lbo_eigenbasis",
    "auto_wks",
    "wks",
    "fmap_to_pmap",
    "pmap_to_fmap",
    "zoomout",
]

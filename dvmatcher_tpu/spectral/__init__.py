from dvmatcher_tpu.spectral.laplacian import (
    connection_eigenbasis,
    connection_laplacian,
    cotan_laplacian,
    lbo_eigenbasis,
)
from dvmatcher_tpu.spectral.wks import auto_wks, wks
from dvmatcher_tpu.spectral.fmap import (
    bijective_pmaps,
    bijective_zoomout,
    fmap_to_pmap,
    pmap_to_fmap,
    zoomout,
)

__all__ = [
    "cotan_laplacian",
    "lbo_eigenbasis",
    "connection_laplacian",
    "connection_eigenbasis",
    "bijective_pmaps",
    "bijective_zoomout",
    "auto_wks",
    "wks",
    "fmap_to_pmap",
    "pmap_to_fmap",
    "zoomout",
]

"""Wave Kernel Signature descriptors (port of misc/utils.py:376-439)."""

from __future__ import annotations

import numpy as np


def wks(
    evals: np.ndarray,
    evects: np.ndarray,
    energy_list: np.ndarray,
    sigma: float,
    scaled: bool = False,
) -> np.ndarray:
    """(N, num_E) WKS; eigenpairs with eval <= 1e-5 are dropped."""
    assert sigma > 0
    evals = np.asarray(evals).ravel()
    keep = evals > 1e-5
    evals = evals[keep]
    evects = evects[:, keep]

    e_list = np.asarray(energy_list)
    coefs = np.exp(
        -np.square(e_list[:, None] - np.log(np.abs(evals))[None, :])
        / (2 * sigma**2)
    )  # (num_E, K)
    weighted = evects[None] * coefs[:, None, :]  # (num_E, N, K)
    natural = np.einsum("tnk,nk->nt", weighted, evects)  # (N, num_E)
    if scaled:
        return natural / coefs.sum(1)[None, :]
    return natural


def auto_wks(evals: np.ndarray, evects: np.ndarray, num_e: int, scaled: bool = True):
    """Automatic energy range (misc/utils.py:376-401)."""
    abs_ev = np.sort(np.abs(evals))
    e_min, e_max = np.log(abs_ev[1]), np.log(abs_ev[-1])
    sigma = 7 * (e_max - e_min) / num_e
    e_min += 2 * sigma
    e_max -= 2 * sigma
    energy_list = np.linspace(e_min, e_max, num_e)
    return wks(abs_ev, evects, energy_list, sigma, scaled=scaled)

"""Spacetime (phenomenological-noise) detector graphs: noisy syndrome rounds.

Code-capacity decoding (the reference's setting, BASELINE.json configs)
assumes perfect syndrome measurement.  Real devices measure stabilizers
repeatedly and the measurements themselves flip with probability
``p_meas``.  The standard phenomenological model decodes one CSS sector
from *detection events* — differences of consecutive noisy syndromes over
``d_t`` rounds:

    s_hat_t = H (sum_{tau<=t} e_tau)  XOR  m_t          (m_{d_t-1} = 0:
    D_0 = s_hat_0,  D_t = s_hat_t XOR s_hat_{t-1}        final round perfect)
        = H e_t  XOR  m_t  XOR  m_{t-1}

which is itself a linear code over *fault locations*:

    H' [m*d_t, n*d_t + m*(d_t-1)]
    data fault (q, tau)   -> detectors (c, tau) for c in supp(H[:, q])
    meas fault (c, tau)   -> detectors (c, tau), (c, tau+1)

Everything downstream is the EXISTING machinery on this matrix: the
detector graph is a single-sector TannerGraph (faults play the role of
qubits, detectors of checks, max degree unchanged — so the ELL layout,
every mp backend, the fused kernels, the distributed partitioner, the GNN
decoder, the MC-LER harness, and the union-find baseline all run
unchanged).  Only two pieces are spacetime-specific and injected at build
time: the *physical* logical operators (the base code's logicals lifted
uniformly over the data-fault blocks — failure depends on the NET data
error, not on H''s own mostly-gauge kernel) and the per-location noise
rates (data faults at p, measurement faults at p * meas_ratio).
"""

from __future__ import annotations

import numpy as np

from tpugnn.tanner.graph import TannerGraph, build_tanner_graph
from tpugnn.utils import f2

__all__ = ["spacetime_matrix", "build_spacetime_code"]


def spacetime_matrix(h: np.ndarray, d_t: int) -> np.ndarray:
    """Detector parity-check H' over fault locations for one sector."""
    h = np.asarray(h, np.uint8)
    m, n = h.shape
    if d_t < 1:
        raise ValueError("need d_t >= 1 measurement rounds")
    n_meas = m * (d_t - 1)
    hp = np.zeros((m * d_t, n * d_t + n_meas), np.uint8)
    for t in range(d_t):
        hp[t * m : (t + 1) * m, t * n : (t + 1) * n] = h
    for t in range(d_t - 1):  # measurement fault (c, t): detectors t and t+1
        for c in range(m):
            col = n * d_t + t * m + c
            hp[t * m + c, col] ^= 1
            hp[(t + 1) * m + c, col] ^= 1
    return hp


def build_spacetime_code(
    family: str,
    distance: int,
    d_t: int,
    *,
    sector: str = "z",
    meas_ratio: float = 1.0,
    pad_nodes: int = 8,
    pad_edges: int = 128,
) -> TannerGraph:
    """Detector graph for ``d_t`` noisy syndrome rounds of one sector.

    ``sector='z'`` decodes X-type data faults via the Z-type stabilizers
    (``'x'`` the converse).  ``meas_ratio`` scales the measurement-fault
    rate relative to the data-fault rate p (sampling draws faults at
    ``p * rate_scale``).
    """
    from tpugnn.tanner import surface, toric, repetition, steane

    checks = {
        "surface": surface.surface_code_checks,
        "toric": toric.toric_code_checks,
        "repetition": repetition.repetition_code_checks,
        "steane": steane.steane_code_checks,
    }[family](distance)
    hx, hz = checks
    if sector == "z":
        h, other = np.asarray(hz, np.uint8), np.asarray(hx, np.uint8)
    elif sector == "x":
        h, other = np.asarray(hx, np.uint8), np.asarray(hz, np.uint8)
    else:
        raise ValueError("sector must be 'x' or 'z'")
    if h.shape[0] == 0:
        raise ValueError(f"{family} has no {sector}-type stabilizers")
    m, n = h.shape

    hp = spacetime_matrix(h, d_t)
    n_faults = hp.shape[1]

    # physical logicals lifted over fault locations: the net data error's
    # pairing with the base code's logical of the OPPOSITE type (X faults
    # pair with Z logicals when sector='z')
    base_lx, base_lz = f2.css_logicals(hx, hz)
    base = base_lz if sector == "z" else base_lx
    k = base.shape[0]
    lifted = np.zeros((k, n_faults), np.uint8)
    for t in range(d_t):
        lifted[:, t * n : (t + 1) * n] = base
    # single-sector graph: faults are 'ex' errors detected by Z-type rows;
    # class bit = <lz, ex XOR ex0> -> logicals_z := lifted, logicals_x := a
    # formal partner (zero rows are fine: no ez errors exist here)
    logicals = (np.zeros_like(lifted), lifted)

    rate_scale = np.ones(n_faults, np.float32)
    rate_scale[n * d_t :] = meas_ratio

    g = build_tanner_graph(
        np.zeros((0, n_faults), np.uint8),  # no X-type checks
        hp,
        name=f"{family}_d{distance}_t{d_t}_{sector}",
        pad_nodes=pad_nodes,
        pad_edges=pad_edges,
        logicals=logicals,
        rate_scale=rate_scale,
    )
    return g

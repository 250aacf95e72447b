"""BP + OSD-0: ordered-statistics post-processing of the BP posteriors.

Plain BP fails on degenerate quantum codes mostly by non-convergence (the
residual syndrome does not vanish — see tests/test_bp.py); the standard fix
in the QEC-decoding literature is OSD: order the parity-check columns by BP
reliability, Gauss-eliminate in that order, and solve for a
syndrome-consistent correction supported on the most-likely qubits.  OSD-0
(no higher-order re-processing) already restores matching-class logical
error rates and is the classical companion every BP-vs-learned-decoder
comparison uses.

Split execution mirrors the framework's runtime design [SURVEY.md §2.2]:
the BP message iteration is the jitted on-device program
(baselines/bp.py); the per-shot, data-dependent Gaussian elimination — the
kind of branchy bit manipulation XLA cannot express efficiently — runs in
the native C++ core (csrc/osd.cpp via ctypes, pure-numpy fallback).
"""

from __future__ import annotations

import jax
import numpy as np

from tpugnn.baselines.bp import bp_posteriors
from tpugnn.tanner.graph import TannerGraph
from tpugnn.utils import native

__all__ = ["BPOSDDecoder", "osd0_py"]


def osd0_py(h: np.ndarray, syndromes: np.ndarray, llrs: np.ndarray) -> np.ndarray:
    """Pure-numpy OSD-0 (oracle/fallback for csrc/osd.cpp).

    h: uint8[m, n]; syndromes: uint8[B, m]; llrs: f32[B, n] (ascending order
    = least reliable first).  Returns corrections uint8[B, n].
    """
    m, n = h.shape
    out = np.zeros((syndromes.shape[0], n), np.uint8)
    for s in range(syndromes.shape[0]):
        order = np.argsort(llrs[s], kind="stable")
        a = np.concatenate([h, syndromes[s][:, None]], axis=1).astype(np.uint8)
        rank = 0
        pivots: list[int] = []
        for j in order:
            rows = np.nonzero(a[rank:, j])[0]
            if rows.size == 0:
                continue
            r = rank + rows[0]
            if r != rank:
                a[[rank, r]] = a[[r, rank]]
            elim = np.nonzero(a[:, j])[0]
            for i in elim:
                if i != rank:
                    a[i] ^= a[rank]
            pivots.append(j)
            rank += 1
            if rank == m:
                break
        for i, j in enumerate(pivots):
            out[s, j] = a[i, n]
    return out


class BPOSDDecoder:
    """Batched BP+OSD-0 decoder over both CSS sectors.

    ``decode(syndrome)`` returns (ex_hat, ez_hat) numpy uint8[B, n_qubits];
    every correction is syndrome-consistent by construction (valid
    syndromes always lie in the sector column space).
    """

    def __init__(self, graph: TannerGraph, *, p: float, iters: int = 32,
                 alpha: float = 0.8, force_python: bool = False):
        self.graph = graph
        self.p = p
        self.iters = iters
        self.alpha = alpha
        m, n = graph.n_checks, graph.n_qubits
        is_x = np.asarray(graph.check_is_x)[:m] > 0.5
        self._rows_x = np.nonzero(is_x)[0]          # X checks constrain ez
        self._rows_z = np.nonzero(~is_x)[0]         # Z checks constrain ex
        self._hx = np.ascontiguousarray(
            np.asarray(graph.h_syn_ez)[self._rows_x, :n].astype(np.uint8))
        self._hz = np.ascontiguousarray(
            np.asarray(graph.h_syn_ex)[self._rows_z, :n].astype(np.uint8))
        self._lib = None if force_python else native.load()

    def _osd(self, h: np.ndarray, syn: np.ndarray, llr: np.ndarray) -> np.ndarray:
        if self._lib is not None and h.shape[0] > 0:
            out = np.zeros((syn.shape[0], h.shape[1]), np.uint8)
            self._lib.osd0_decode_batch(
                np.ascontiguousarray(h), h.shape[0], h.shape[1],
                np.ascontiguousarray(syn), np.ascontiguousarray(llr),
                syn.shape[0], out,
            )
            return out
        return osd0_py(h, syn, llr)

    def decode(self, syndrome) -> tuple[np.ndarray, np.ndarray]:
        """syndrome: [B, n_checks_pad] (device or host) -> (ex_hat, ez_hat)."""
        g = self.graph
        n = g.n_qubits
        l_ex, l_ez = bp_posteriors(
            g, syndrome, self.p, iters=self.iters, alpha=self.alpha
        )
        l_ex = np.asarray(jax.device_get(l_ex))[:, :n].astype(np.float32)
        l_ez = np.asarray(jax.device_get(l_ez))[:, :n].astype(np.float32)
        syn = np.asarray(jax.device_get(syndrome)).astype(np.uint8)
        ex_hat = self._osd(self._hz, np.ascontiguousarray(syn[:, self._rows_z]),
                           l_ex)
        ez_hat = self._osd(self._hx, np.ascontiguousarray(syn[:, self._rows_x]),
                           l_ez)
        return ex_hat, ez_hat

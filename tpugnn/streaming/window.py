"""Sliding-window streaming decoder for continuous syndrome measurement.

The batch decoders in tpugnn.eval assume a finite experiment: ``d_t``
measurement rounds, perfect final round, decode once [SURVEY.md §3.2].  A
running quantum computer never stops measuring — decoding must happen in
bounded-latency windows over an unbounded detector stream.  This module
implements the standard overlapping-window scheme (the "overlapping
recovery" of Dennis et al., as used by sliding-window MWPM/union-find
real-time decoders):

* decode a window of ``W`` consecutive syndrome rounds with a decoder
  built for the ``d_t = W`` spacetime detector graph;
* COMMIT only the data-fault corrections of the window's first ``C < W``
  rounds — the window's tail is polluted by measurement faults that the
  final-round-perfect model misattributes, so it is re-decoded with more
  context by the next window;
* slide by ``C``; re-reference the next window's first detector by the
  syndrome of everything committed so far (``D_0' = s_hat_T XOR H e_hat``),
  so residual/mis-corrected errors re-enter the next window as apparent
  time-0 data faults; interior detectors are consecutive differences and
  are frame-invariant;
* the stream's final window (perfect last round, matching the model's
  convention) commits all of its rounds.

The window decoder is pluggable: the trained GNN (``from_gnn``), the
classical union-find baseline (``from_union_find``, exact plumbing tests),
or any ``[B, m_pad] -> ex_hat`` callable.  Decode cost per committed round
is O(W/C) window decodes — constant latency, unbounded stream.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

from tpugnn.tanner.spacetime import build_spacetime_code
from tpugnn.utils import f2

__all__ = ["SlidingWindowDecoder", "sample_stream", "stream_ler"]


def _sector_h(family: str, distance: int, sector: str) -> np.ndarray:
    from tpugnn.tanner import repetition, steane, surface, toric

    checks = {
        "surface": surface.surface_code_checks,
        "toric": toric.toric_code_checks,
        "repetition": repetition.repetition_code_checks,
        "steane": steane.steane_code_checks,
    }[family](distance)
    hx, hz = (np.asarray(c, np.uint8) for c in checks)
    return hz if sector == "z" else hx


class SlidingWindowDecoder:
    """Decode an unbounded noisy-syndrome stream in overlapping windows.

    ``decode_window(detectors [B, m_pad]) -> ex_hat [B, >= n*W]`` predicts
    per-fault flips on the ``d_t = window`` spacetime graph (data faults
    time-major in the first ``n*W`` columns, matching
    tanner/spacetime.spacetime_matrix).
    """

    def __init__(
        self,
        family: str,
        distance: int,
        *,
        window: int,
        commit: int,
        sector: str = "z",
        meas_ratio: float = 1.0,
        decode_window: Optional[Callable[[np.ndarray], np.ndarray]] = None,
        pad_nodes: int = 8,
        pad_edges: int = 128,
    ):
        if not 1 <= commit <= window:
            raise ValueError("need 1 <= commit <= window")
        self.family = family
        self.distance = distance
        self.window = window
        self.commit = commit
        self.sector = sector
        self.h = _sector_h(family, distance, sector)
        if self.h.shape[0] == 0:
            raise ValueError(f"{family} has no {sector}-type stabilizers")
        self.m, self.n = self.h.shape
        self.graph = build_spacetime_code(
            family, distance, window, sector=sector, meas_ratio=meas_ratio,
            pad_nodes=pad_nodes, pad_edges=pad_edges,
        )
        self._decode_window = decode_window

    # -- adapters -----------------------------------------------------------

    @classmethod
    def from_gnn(cls, family, distance, *, window, commit, apply_fn, params,
                 sector: str = "z", **kw) -> "SlidingWindowDecoder":
        """Window decoder = a trained GNN (apply_fn(params, graph, syn))."""
        self = cls(family, distance, window=window, commit=commit,
                   sector=sector, **kw)

        import jax

        from tpugnn.eval.ler import decode_corrections

        graph = self.graph

        @jax.jit
        def _decode(syn):
            out = apply_fn(params, graph, syn)
            ex, _ = decode_corrections(out.qubit_logits)
            return ex

        self._decode_window = lambda d: np.asarray(
            _decode(np.asarray(d, np.float32)))
        return self

    @classmethod
    def from_gnn_cleanup(cls, family, distance, *, window, commit, apply_fn,
                         params, sector: str = "z", cleanup: str = "uf",
                         tau: Optional[float] = None,
                         p: Optional[float] = None,
                         **kw) -> "SlidingWindowDecoder":
        """Window decoder = GNN + classical cleanup of the residual window
        syndrome (tpugnn.eval.hybrid applied per window).

        Raw per-qubit GNN corrections are frequently syndrome-INconsistent;
        committing them poisons the re-referenced frame of every later
        window.  Cleaning each window's residual with union-find/MWPM makes
        every committed correction consistent by construction — the
        streaming analog of eval.hybrid.ler_gnn_cleanup.
        """
        self = cls(family, distance, window=window, commit=commit,
                   sector=sector, **kw)

        import jax
        import jax.numpy as jnp

        from tpugnn.eval.hybrid import _gated_corrections
        from tpugnn.sampling.noise import syndrome as syn_of

        graph = self.graph

        @jax.jit
        def _fwd(syn):
            out = apply_fn(params, graph, syn)
            ex, ez = _gated_corrections(out.qubit_logits, tau)
            s_res = jnp.mod(syn + syn_of(graph, ex, ez), 2.0)
            return ex, s_res

        if cleanup == "uf":
            from tpugnn.baselines.union_find import UnionFindDecoder

            dec = UnionFindDecoder(graph)
        elif cleanup == "mwpm":
            from tpugnn.baselines.mwpm import MWPMDecoder

            dec = MWPMDecoder(graph, p=p)
        else:
            raise ValueError(f"unknown cleanup decoder {cleanup!r}")

        def _decode(d):
            ex_g, s_res = _fwd(np.asarray(d, np.float32))
            ex_u, _ = dec.decode(np.asarray(s_res))
            cols = ex_u.shape[1]
            return np.asarray(ex_g)[:, :cols].astype(np.uint8) ^ \
                ex_u.astype(np.uint8)

        self._decode_window = _decode
        return self

    @classmethod
    def from_union_find(cls, family, distance, *, window, commit,
                        sector: str = "z", **kw) -> "SlidingWindowDecoder":
        """Window decoder = the classical union-find baseline (exact tests)."""
        self = cls(family, distance, window=window, commit=commit,
                   sector=sector, **kw)
        from tpugnn.baselines.union_find import UnionFindDecoder

        uf = UnionFindDecoder(self.graph)

        def _decode(d):
            ex, _ = uf.decode(d)
            return ex

        self._decode_window = _decode
        return self

    @classmethod
    def from_mwpm(cls, family, distance, *, window, commit,
                  sector: str = "z", p: Optional[float] = None,
                  **kw) -> "SlidingWindowDecoder":
        """Window decoder = exact MWPM on the window's detector graph (the
        classic sliding-window matching decoder this module's scheme comes
        from).  Pass the physical rate ``p`` for log-likelihood-weighted
        matching when measurement and data fault rates differ."""
        self = cls(family, distance, window=window, commit=commit,
                   sector=sector, **kw)
        from tpugnn.baselines.mwpm import MWPMDecoder

        mw = MWPMDecoder(self.graph, p=p)

        def _decode(d):
            ex, _ = mw.decode(d)
            return ex

        self._decode_window = _decode
        return self

    # -- streaming ----------------------------------------------------------

    def decode_stream(self, s_hat: np.ndarray) -> np.ndarray:
        """Noisy syndromes [B, T, m] -> net data-fault correction [B, n].

        ``s_hat`` follows the cumulative-error convention of
        tanner/spacetime.py: ``s_hat_t = H(XOR_{tau<=t} e_tau) XOR m_t``
        with a perfect final round (``m_{T-1} = 0``).  Requires ``T >=
        window`` and ``(T - window) % commit == 0`` so commit regions tile
        the stream exactly.
        """
        if self._decode_window is None:
            raise ValueError("no window decoder configured")
        s_hat = np.asarray(s_hat, np.uint8)
        if s_hat.ndim == 2:
            s_hat = s_hat[None]
        b, t, m = s_hat.shape
        w, c, n = self.window, self.commit, self.n
        if m != self.m:
            raise ValueError(f"syndrome width {m} != {self.m} checks")
        if t < w or (t - w) % c:
            raise ValueError(
                f"stream length {t} must be window + k*commit "
                f"(window={w}, commit={c})")
        m_pad = self.graph.n_checks_pad
        e_total = np.zeros((b, n), np.uint8)
        offset = 0
        while True:
            last = offset == t - w
            det = np.zeros((b, w, m), np.uint8)
            # frame re-reference: committed corrections make the apparent
            # time-(offset) syndrome H(E XOR e_total); residuals re-enter
            # the window as time-0 data faults
            det[:, 0] = s_hat[:, offset] ^ (e_total @ self.h.T % 2)
            det[:, 1:] = s_hat[:, offset + 1 : offset + w] \
                ^ s_hat[:, offset : offset + w - 1]
            flat = np.zeros((b, m_pad), np.uint8)
            flat[:, : w * m] = det.reshape(b, w * m)
            ex = np.asarray(self._decode_window(flat), np.uint8)
            n_commit = w if last else c
            for tau in range(n_commit):
                e_total ^= ex[:, tau * n : (tau + 1) * n]
            if last:
                return e_total
            offset += c


def sample_stream(
    rng: np.random.Generator,
    family: str,
    distance: int,
    *,
    p: float,
    rounds: int,
    batch: int = 1,
    sector: str = "z",
    meas_ratio: float = 1.0,
):
    """Phenomenological stream: (s_hat [B, T, m], e_net [B, n]).

    Data faults e_t ~ Bern(p) per round, measurement faults m_t ~
    Bern(p * meas_ratio) except the (perfect) final round; syndromes follow
    the cumulative convention s_hat_t = H(XOR_{tau<=t} e_tau) XOR m_t.
    """
    h = _sector_h(family, distance, sector)
    m, n = h.shape
    e = (rng.random((batch, rounds, n)) < p).astype(np.uint8)
    cum = np.bitwise_xor.accumulate(e, axis=1)
    meas = (rng.random((batch, rounds, m)) < p * meas_ratio).astype(np.uint8)
    meas[:, -1] = 0
    s_hat = (cum @ h.T % 2).astype(np.uint8) ^ meas
    return s_hat, cum[:, -1]


def stream_ler(
    decoder: SlidingWindowDecoder,
    *,
    p: float,
    rounds: int,
    shots: int,
    seed: int = 0,
    batch: int = 256,
    meas_ratio: float = 1.0,
) -> dict:
    """Monte-Carlo logical error rate of the streaming decoder.

    Failure per shot: the residual E XOR E_hat is not syndrome-free, or it
    anticommutes with a base-code logical of the opposite type (same
    convention as eval/ler.py for the monolithic spacetime decode).
    """
    h = decoder.h
    from tpugnn.tanner import repetition, steane, surface, toric

    checks = {
        "surface": surface.surface_code_checks,
        "toric": toric.toric_code_checks,
        "repetition": repetition.repetition_code_checks,
        "steane": steane.steane_code_checks,
    }[decoder.family](decoder.distance)
    hx, hz = (np.asarray(x, np.uint8) for x in checks)
    lx, lz = f2.css_logicals(hx, hz)
    logical = lz if decoder.sector == "z" else lx

    rng = np.random.default_rng(seed)
    fails = 0
    done = 0
    while done < shots:
        bsz = min(batch, shots - done)
        s_hat, e_net = sample_stream(
            rng, decoder.family, decoder.distance, p=p, rounds=rounds,
            batch=bsz, sector=decoder.sector, meas_ratio=meas_ratio,
        )
        e_hat = decoder.decode_stream(s_hat)
        res = e_net ^ e_hat
        syn_bad = (res @ h.T % 2).any(axis=1)
        log_bad = (res @ logical.T % 2).any(axis=1)
        fails += int(np.logical_or(syn_bad, log_bad).sum())
        done += bsz
    ler = fails / done
    return {"ler": ler, "shots": float(done),
            "ler_stderr": (max(ler * (1 - ler), 1e-12) / done) ** 0.5}

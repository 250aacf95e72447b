"""GNN + classical-cleanup hybrid decoding.

The deployed hybrid rule in :mod:`tpugnn.eval.ler` falls back to the
logical-class head whenever the per-qubit correction is syndrome-
inconsistent.  This module implements the stronger decode-time rule
[SURVEY.md §2.1 C6 "MWPM/baseline comparison"; VERDICT r1 item 1]:

    e_hat = e_gnn  XOR  cleanup(s XOR H @ e_gnn)

i.e. the GNN removes the bulk of the error pattern and a classical decoder
(union-find or exact MWPM) repairs the *residual* syndrome, so the combined
correction is syndrome-consistent by construction and exploits the GNN's
per-qubit soft information instead of throwing it away on a mismatch.

Optionally the GNN correction is confidence-gated: with ``tau`` set, only
qubit flips whose posterior max-probability exceeds ``tau`` are kept (the
rest are left to the cleanup decoder), which protects the matcher from
low-confidence GNN mistakes that create long residual strings.

Everything device-side (sampling, GNN forward, residual syndrome) stays one
jitted program; only the classical cleanup runs host-side, exactly like the
pure classical baselines in :mod:`tpugnn.eval.baseline`.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from tpugnn.eval.ler import decode_corrections
from tpugnn.sampling.noise import sample_batch
from tpugnn.tanner.graph import TannerGraph

__all__ = ["gnn_cleanup_corrections", "ler_gnn_cleanup"]


@lru_cache(maxsize=64)
def _sample_fwd_fn(apply_fn: Callable, tau: float | None, batch: int):
    """Jitted sample+forward+residual chunk, cached across calls so an LER
    sweep compiles once per decoder (graph and p are traced arguments)."""
    from tpugnn.sampling.noise import syndrome as syn_of

    @jax.jit
    def sample_fwd(params, graph, k, p_):
        b = sample_batch(k, graph, p_, batch)
        out = apply_fn(params, graph, b.syndrome)
        ex_g, ez_g = _gated_corrections(out.qubit_logits, tau)
        s_res = jnp.mod(b.syndrome + syn_of(graph, ex_g, ez_g), 2.0)
        return b.ex, b.ez, ex_g, ez_g, s_res

    return sample_fwd


@lru_cache(maxsize=64)
def _fwd_fn(apply_fn: Callable, tau: float | None):
    from tpugnn.sampling.noise import syndrome as syn_of

    @jax.jit
    def fwd(params, graph, syn):
        out = apply_fn(params, graph, syn)
        ex_g, ez_g = _gated_corrections(out.qubit_logits, tau)
        s_res = jnp.mod(syn + syn_of(graph, ex_g, ez_g), 2.0)
        return ex_g, ez_g, s_res

    return fwd


def _gated_corrections(qubit_logits: jnp.ndarray, tau: float | None):
    """Hard (ex, ez) from logits, optionally zeroed below confidence tau."""
    ex, ez = decode_corrections(qubit_logits)
    if tau is None:
        return ex, ez
    if qubit_logits.shape[-1] == 4:
        prob = jax.nn.softmax(qubit_logits, axis=-1)
        conf = jnp.max(prob, axis=-1)
    else:
        # sigmoid bits: confidence = max(p, 1-p) of the chosen bit, jointly
        p = jax.nn.sigmoid(qubit_logits)
        conf = jnp.prod(jnp.maximum(p, 1.0 - p), axis=-1)
    keep = (conf >= tau).astype(jnp.float32)
    return ex * keep, ez * keep


def gnn_cleanup_corrections(
    apply_fn: Callable,
    params,
    graph: TannerGraph,
    syndrome_batch: jnp.ndarray,
    cleanup_decoder,
    *,
    tau: float | None = None,
):
    """Decode one batch: GNN correction + classical cleanup of the residual.

    ``cleanup_decoder.decode(syndrome [B, n_checks_pad]) -> (ex, ez)`` over
    the unpadded ``n_qubits`` (UnionFindDecoder / MWPMDecoder API).
    Returns host uint8 arrays (ex_hat, ez_hat) of shape [B, n_qubits].
    """
    n = graph.n_qubits
    ex_g, ez_g, s_res = _fwd_fn(apply_fn, tau)(params, graph, syndrome_batch)
    ex_u, ez_u = cleanup_decoder.decode(np.asarray(s_res))
    ex_hat = (np.asarray(ex_g)[:, :n].astype(np.uint8) ^ ex_u.astype(np.uint8))
    ez_hat = (np.asarray(ez_g)[:, :n].astype(np.uint8) ^ ez_u.astype(np.uint8))
    return ex_hat, ez_hat


def ler_gnn_cleanup(
    apply_fn: Callable,
    params,
    graph: TannerGraph,
    *,
    p: float,
    shots: int,
    batch: int = 4096,
    key: jax.Array | None = None,
    cleanup: str = "uf",
    tau: float | None = None,
    force_python: bool = False,
) -> dict[str, float]:
    """Monte-Carlo LER of the GNN + cleanup hybrid decoder."""
    if cleanup == "uf":
        from tpugnn.baselines.union_find import UnionFindDecoder

        dec = UnionFindDecoder(graph, force_python=force_python)
    elif cleanup == "mwpm":
        from tpugnn.baselines.mwpm import MWPMDecoder

        dec = MWPMDecoder(graph, p=p, force_python=force_python)
    else:
        raise ValueError(f"unknown cleanup decoder {cleanup!r}")

    key = key if key is not None else jax.random.PRNGKey(0)
    n = graph.n_qubits
    hx = np.asarray(graph.h_syn_ez)[: graph.n_checks, :n]
    hz = np.asarray(graph.h_syn_ex)[: graph.n_checks, :n]
    lx = np.asarray(graph.logicals_x)[:, :n]
    lz = np.asarray(graph.logicals_z)[:, :n]

    sample_fwd = _sample_fwd_fn(apply_fn, tau, batch)
    fails = 0
    syn_mismatch = 0
    total = 0
    for _ in range(max(1, (shots + batch - 1) // batch)):
        key, sub = jax.random.split(key)
        ex, ez, ex_g, ez_g, s_res = sample_fwd(params, graph, sub, p)
        ex_u, ez_u = dec.decode(np.asarray(s_res))
        ex_hat = np.asarray(ex_g)[:, :n].astype(np.uint8) ^ ex_u.astype(np.uint8)
        ez_hat = np.asarray(ez_g)[:, :n].astype(np.uint8) ^ ez_u.astype(np.uint8)
        rx = (np.asarray(ex)[:, :n].astype(np.uint8) ^ ex_hat) & 1
        rz = (np.asarray(ez)[:, :n].astype(np.uint8) ^ ez_hat) & 1
        sm = ((rx @ hz.T) % 2).any(axis=1) | ((rz @ hx.T) % 2).any(axis=1)
        lf = ((rx @ lz.T) % 2).any(axis=1) | ((rz @ lx.T) % 2).any(axis=1)
        fails += int(np.sum(sm | lf))
        syn_mismatch += int(np.sum(sm))
        total += batch
    ler = fails / total
    return {
        "ler": ler,
        "ler_stderr": (max(ler * (1 - ler), 1e-12) / total) ** 0.5,
        "syn_mismatch_rate": syn_mismatch / total,
        "shots": float(total),
        "decoder": f"gnn+{cleanup}" + (f"@tau{tau}" if tau is not None else ""),
    }

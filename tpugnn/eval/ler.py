"""Monte-Carlo logical-error-rate (LER) evaluation, fully on-device.

The reference's evaluation loop samples syndromes, decodes, applies the
correction and checks commutation with the logical operators host-side
[SURVEY.md §3.2 C6].  Here the entire pipeline — sampling, decoding, residual
computation, logical-parity check — is one jitted function vmapped over the
shot batch; the host only accumulates scalar counters across chunks.

Failure accounting (per shot):

* **per-qubit head**: correction (ex_hat, ez_hat) from thresholded logits.
  Failure iff the correction's syndrome mismatches the observed syndrome
  (residual is not in ker H) OR the residual anticommutes with any logical
  operator: <lz_i, rx> = 1 or <lx_i, rz> = 1.
* **logical head**: predicted class bits (relative to the pure error T @ s)
  vs the true class bits; failure iff any bit differs.  Applying
  e0 = T @ s XOR the predicted logicals realizes this decoder physically.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Callable

import jax
import jax.numpy as jnp

from tpugnn.sampling.noise import SyndromeBatch, sample_batch, syndrome
from tpugnn.tanner.graph import TannerGraph

__all__ = ["decode_corrections", "count_failures", "ler_monte_carlo"]


@lru_cache(maxsize=64)
def _chunk_fn(apply_fn: Callable, batch: int):
    """One jitted MC chunk per (decoder, batch size).

    Both ``p`` (noise rate) and the graph are TRACED arguments, and the jit
    object is cached across ``ler_monte_carlo`` calls — a whole LER sweep
    (many p points, many calls) compiles exactly ONE program per decoder.
    A per-call ``jax.jit`` would recompile at every point: minutes each on
    the tunneled TPU.
    """

    @jax.jit
    def chunk(params, graph, key, p_):
        b = sample_batch(key, graph, p_, batch)
        out = apply_fn(params, graph, b.syndrome)
        ex_hat, ez_hat = decode_corrections(out.qubit_logits)
        fails = count_failures(graph, b, ex_hat, ez_hat, out.logical_logits)
        return {k: jnp.sum(v) for k, v in fails.items()}

    return chunk


def decode_corrections(out_qubit_logits: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-qubit logits -> hard correction (ex, ez).

    Two head layouts: width 2 = independent sigmoid bits (threshold at 0);
    width 4 = Pauli softmax over [I, X, Z, Y] with index = ex + 2*ez
    (argmax decodes both components jointly).
    """
    if out_qubit_logits.shape[-1] == 4:
        idx = jnp.argmax(out_qubit_logits, axis=-1)
        return (idx % 2).astype(jnp.float32), (idx // 2).astype(jnp.float32)
    hard = (out_qubit_logits > 0.0).astype(jnp.float32)
    return hard[..., 0], hard[..., 1]


def count_failures(
    graph: TannerGraph,
    batch: SyndromeBatch,
    ex_hat: jnp.ndarray,
    ez_hat: jnp.ndarray,
    logical_logits: jnp.ndarray | None,
) -> dict[str, jnp.ndarray]:
    """Per-shot failure indicators for both decoding heads."""
    rx = jnp.mod(batch.ex + ex_hat, 2.0)
    rz = jnp.mod(batch.ez + ez_hat, 2.0)
    s_hat = syndrome(graph, ex_hat, ez_hat)
    syn_mismatch = jnp.any(s_hat != batch.syndrome, axis=-1)
    lx_flip = jnp.mod(rx @ graph.logicals_z.T, 2.0)  # residual X vs Z-logicals
    lz_flip = jnp.mod(rz @ graph.logicals_x.T, 2.0)
    logical_flip = jnp.any(lx_flip + lz_flip > 0.5, axis=-1)
    fail_qubit = jnp.logical_or(syn_mismatch, logical_flip).astype(jnp.float32)

    res = {
        "fail_qubit": fail_qubit,
        "syn_mismatch": syn_mismatch.astype(jnp.float32),
    }
    if logical_logits is not None:
        pred_bits = (logical_logits > 0.0).astype(jnp.float32)
        fail_logical = jnp.any(
            pred_bits != batch.class_bits, axis=-1
        ).astype(jnp.float32)
        res["fail_logical"] = fail_logical
        # hybrid deployment rule: use the per-qubit correction when it is
        # syndrome-consistent; otherwise fall back to the always-consistent
        # pure-error + predicted-logical correction
        res["fail_hybrid"] = jnp.where(
            syn_mismatch, fail_logical, logical_flip.astype(jnp.float32)
        )
    return res


def ler_monte_carlo(
    apply_fn: Callable,
    params,
    graph: TannerGraph,
    *,
    p: float,
    shots: int,
    batch: int,
    key: jax.Array,
) -> dict[str, float]:
    """Monte-Carlo LER estimate over ``shots`` decoding episodes.

    ``apply_fn(params, graph, syndrome) -> DecoderOutput``-like object with
    ``qubit_logits`` and optional ``logical_logits``.
    Returns scalar metrics including the binomial standard error.
    """
    chunk = _chunk_fn(apply_fn, batch)
    n_chunks = max(1, (shots + batch - 1) // batch)
    total = {}
    # accumulate on-device and read back ONCE: float() per chunk would
    # hard-sync every iteration (tunnel completion-poll ~30 ms each — ~7 s
    # of pure client overhead per 1M-shot point, PERF_NOTES); async
    # dispatch keeps the chip busy across chunk boundaries instead
    for i in range(n_chunks):
        key, sub = jax.random.split(key)
        c = chunk(params, graph, sub, p)
        for k, v in c.items():
            total[k] = total[k] + v if k in total else v
    total = {k: float(v) for k, v in total.items()}
    n = n_chunks * batch
    out = {f"{k}_rate": v / n for k, v in total.items()}
    ler = out.get("fail_qubit_rate", 0.0)
    out["ler"] = ler
    out["ler_stderr"] = (max(ler * (1 - ler), 1e-12) / n) ** 0.5
    out["shots"] = float(n)
    if "fail_logical_rate" in out:
        out["ler_logical"] = out["fail_logical_rate"]
    if "fail_hybrid_rate" in out:
        out["ler_hybrid"] = out["fail_hybrid_rate"]
    return out

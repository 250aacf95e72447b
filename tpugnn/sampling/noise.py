"""On-device syndrome sampling: depolarizing noise + parity extraction.

The reference samples noise host-side with torch RNG and pays an H2D transfer
per batch [SURVEY.md §3.1, C2]; here the whole pipeline — error sampling,
syndrome extraction, logical class labels — is a pure jittable function of a
threefry key, so training never touches the host and the sampler composes
with vmap / shard_map for free.

Mod-2 arithmetic is done as f32 matmuls followed by ``% 2``: stabilizer
weights are <= 4 and batch matmuls of shape [B, n] x [n, m] run on the MXU,
which is exact in f32 at these magnitudes and orders of magnitude faster than
per-element XOR gathers on TPU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpugnn.tanner.graph import TannerGraph

__all__ = ["SyndromeBatch", "sample_depolarizing", "sample_batch", "syndrome", "logical_class_bits"]


class SyndromeBatch(NamedTuple):
    """One batch of decoding episodes (all arrays on device).

    ex, ez:     f32[B, n_pad]  sampled Pauli error, symplectic components
                (ex=1: X or Y on that qubit; ez=1: Z or Y)
    syndrome:   f32[B, m_pad]  stabilizer parities in {0, 1}
    class_bits: f32[B, 2k]     logical class of the error relative to the
                pure error T @ s (bx then bz bits) — targets for the
                logical-class readout head
    """

    ex: jnp.ndarray
    ez: jnp.ndarray
    syndrome: jnp.ndarray
    class_bits: jnp.ndarray


def sample_depolarizing(
    key: jax.Array, graph: TannerGraph, p: float, batch: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """i.i.d. depolarizing noise at rate p on the real data qubits.

    Each qubit suffers X, Y, Z with probability p/3 each.  A single uniform
    draw per qubit is bucketed into the four outcomes:
        u <  p/3        -> X  (ex=1)
        p/3 <= u < 2p/3 -> Y  (ex=1, ez=1)
        2p/3 <= u < p   -> Z  (ez=1)
    Padded qubit slots never receive errors.
    """
    u = jax.random.uniform(key, (batch, graph.n_qubits_pad))
    if graph.rate_scale is not None:
        # single-sector graph (spacetime/phenomenological): independent
        # bit-flip faults at per-location rate p * rate_scale
        ex = (u < p * graph.rate_scale).astype(jnp.float32)
        return ex * graph.qubit_mask, jnp.zeros_like(ex)
    ex = (u < 2.0 * p / 3.0).astype(jnp.float32)
    ez = ((u >= p / 3.0) & (u < p)).astype(jnp.float32)
    return ex * graph.qubit_mask, ez * graph.qubit_mask


def syndrome(graph: TannerGraph, ex: jnp.ndarray, ez: jnp.ndarray) -> jnp.ndarray:
    """Stabilizer syndrome s in {0,1}^[..., m_pad].

    X-type stabilizers (rows of ``h_syn_ez``) anticommute with the Z
    component of the error; Z-type stabilizers with the X component.
    """
    acc = ez @ graph.h_syn_ez.T + ex @ graph.h_syn_ex.T
    return jnp.mod(acc, 2.0)


def logical_class_bits(
    graph: TannerGraph, ex: jnp.ndarray, ez: jnp.ndarray, s: jnp.ndarray
) -> jnp.ndarray:
    """Logical equivalence class of e relative to the pure error T @ s.

    c = e XOR e0 lies in ker(H); its class bits are the symplectic pairings
    with the paired logical operators:  bx_i = <lz_i, cx>, bz_i = <lx_i, cz>.
    Returns f32[..., 2k] (bx bits then bz bits).
    """
    ex0 = jnp.mod(s @ graph.pure_ex.T, 2.0)
    ez0 = jnp.mod(s @ graph.pure_ez.T, 2.0)
    cx = jnp.mod(ex + ex0, 2.0)
    cz = jnp.mod(ez + ez0, 2.0)
    bx = jnp.mod(cx @ graph.logicals_z.T, 2.0)
    bz = jnp.mod(cz @ graph.logicals_x.T, 2.0)
    return jnp.concatenate([bx, bz], axis=-1)


def sample_batch(
    key: jax.Array, graph: TannerGraph, p: float, batch: int
) -> SyndromeBatch:
    """Sample a full training/eval batch of decoding episodes on device."""
    ex, ez = sample_depolarizing(key, graph, p, batch)
    s = syndrome(graph, ex, ez)
    bits = logical_class_bits(graph, ex, ez, s)
    return SyndromeBatch(ex=ex, ez=ez, syndrome=s, class_bits=bits)

"""Normalized min-sum belief-propagation baseline decoder, fully on-device.

The GNN-decoder literature evaluates learned decoders against classical BP
on the same Tanner graph (the GNN is architecturally a *neural* BP, so
plain BP is the natural ablation baseline alongside matching-style decoders
[SURVEY.md §2.1 C6]).  The reference's own baseline is a matching decoder;
union-find (baselines/union_find.py) covers that role — this module adds
the BP point of comparison.

TPU-native formulation: messages live on the padded canonical edge list
([B, E_pad] arrays); the check-update's excluding-self sign/min and the
qubit-update's excluding-self sums are computed with the same ELL slot
tables the MP engine uses (tanner/graph.py), so the whole decoder is a
fixed-iteration `lax.fori_loop` of gathers + masked slot reductions — no
scatter, no data-dependent control flow, jit/vmap-friendly.

Both CSS sectors run in one message array (sectors are edge-disjoint:
every edge belongs to exactly one check; per-sector masked sums keep the
beliefs separated).  X-type checks constrain ``ez``, Z-type checks ``ex``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpugnn.tanner.graph import TannerGraph

__all__ = ["bp_decode", "bp_posteriors"]

_BIG = 1e9  # sentinel magnitude for masked slots


def _prior_llr(graph: TannerGraph, p: float) -> jnp.ndarray:
    """Per-qubit prior LLR log((1-q)/q) of a single Pauli component.

    Depolarizing at rate p: marginal flip probability of each component is
    2p/3 (that component or Y).  Graphs with ``rate_scale`` (spacetime /
    detector graphs) sample single-sector bit flips at p * rate_scale.
    """
    if graph.rate_scale is not None:
        q = p * graph.rate_scale
    else:
        q = jnp.full((graph.n_qubits_pad,), 2.0 * p / 3.0)
    q = jnp.clip(q, 1e-9, 0.5 - 1e-6)
    return jnp.log((1.0 - q) / q).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("iters",))
def bp_posteriors(
    graph: TannerGraph,
    syndrome: jnp.ndarray,   # f32/[B, m_pad] 0/1
    p: float | jnp.ndarray,
    *,
    iters: int = 32,
    alpha: float = 0.8,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Posterior LLRs (L_ex, L_ez), each [B, n_pad]; negative => flip."""
    ec, eq = graph.edge_check, graph.edge_qubit
    emask = graph.edge_mask                                    # [E]
    # edge sector: 1.0 where the edge's check is X-type (constrains ez)
    sec_x = jnp.take(graph.check_is_x, ec) * emask             # [E]
    sec_z = (1.0 - jnp.take(graph.check_is_x, ec)) * emask
    lam = _prior_llr(graph, p)                                 # [n_pad]
    lam_e = jnp.take(lam, eq)                                  # [E]
    # (-1)^syndrome per edge, from the edge's own check
    syn_sign = 1.0 - 2.0 * jnp.take(syndrome, ec, axis=-1)     # [B, E]

    ell_c, mask_c = graph.ell_check_edge, graph.ell_check_mask   # [m, Dc]
    ell_q, mask_q = graph.ell_qubit_edge, graph.ell_qubit_mask   # [n, Dq]

    def qubit_sums(msg):
        """Per-sector sums of incoming check messages per qubit [B, n_pad]."""
        mx = jnp.take(msg * sec_x, ell_q, axis=-1) * mask_q      # [B, n, Dq]
        mz = jnp.take(msg * sec_z, ell_q, axis=-1) * mask_q
        return jnp.sum(mx, axis=-1), jnp.sum(mz, axis=-1)

    def body(_, msg):                                           # msg: [B, E]
        # --- qubit -> check: prior + same-sector sum excluding self -------
        s_x, s_z = qubit_sums(msg)
        s_own = sec_x * jnp.take(s_x, eq, axis=-1) + \
            sec_z * jnp.take(s_z, eq, axis=-1)
        q_msg = lam_e + s_own - msg                             # [B, E]

        # --- check -> qubit: normalized min-sum excluding self ------------
        qs = jnp.take(q_msg, ell_c, axis=-1)                    # [B, m, Dc]
        mag = jnp.abs(qs) * mask_c + _BIG * (1.0 - mask_c)
        neg = (qs < 0.0) & (mask_c > 0.5)
        n_neg = jnp.sum(neg, axis=-1, keepdims=True)            # [B, m, 1]
        # row sign excluding self: (-1)^(n_neg - self_neg)
        sgn = 1.0 - 2.0 * jnp.mod(n_neg - neg, 2.0)             # [B, m, Dc]
        m1 = jnp.min(mag, axis=-1, keepdims=True)               # [B, m, 1]
        k1 = jnp.argmin(mag, axis=-1)                           # [B, m]
        is_min = jax.nn.one_hot(k1, mag.shape[-1], dtype=mag.dtype)
        m2 = jnp.min(mag + _BIG * is_min, axis=-1, keepdims=True)
        excl_min = jnp.where(is_min > 0.5, m2, m1)              # [B, m, Dc]
        # cap the magnitude: degree-1 rows (boundary edges of detector
        # graphs) have no excluding-self neighbor — their parity pins the
        # qubit, expressed as a strong-but-finite LLR
        out_slots = alpha * sgn * jnp.minimum(excl_min, 20.0)   # [B, m, Dc]
        # slots -> edges: each real edge occupies exactly one (row, slot);
        # flatten and gather through the static inverse table
        flat = (out_slots * mask_c).reshape(out_slots.shape[0], -1)
        inv = _edge_to_slot(graph)                              # [E]
        return jnp.take(flat, inv, axis=-1) * syn_sign * emask

    msg0 = jnp.zeros(syndrome.shape[:1] + ec.shape, jnp.float32)
    msg = jax.lax.fori_loop(0, iters, body, msg0)
    s_x, s_z = qubit_sums(msg)
    return lam[None] + s_z, lam[None] + s_x   # L_ex (Z checks), L_ez (X checks)


@functools.partial(jax.jit, static_argnames=("iters",))
def bp_decode(
    graph: TannerGraph,
    syndrome: jnp.ndarray,
    p: float | jnp.ndarray,
    *,
    iters: int = 32,
    alpha: float = 0.8,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Hard-decision corrections (ex_hat, ez_hat), each f32[B, n_pad]."""
    l_ex, l_ez = bp_posteriors(graph, syndrome, p, iters=iters, alpha=alpha)
    qm = graph.qubit_mask[None]
    return ((l_ex < 0.0) * qm).astype(jnp.float32), \
        ((l_ez < 0.0) * qm).astype(jnp.float32)


def _edge_to_slot(graph: TannerGraph) -> jnp.ndarray:
    """i32[E_pad]: flattened (row, slot) position of each canonical edge in
    the check ELL table (inverse of ell_check_edge; padded edges point at a
    masked slot of the sentinel row, whose value is always 0)."""
    flat_ids = graph.ell_check_edge.reshape(-1)                # [m*Dc]
    e_pad = graph.edge_check.shape[0]
    # scatter-free inverse: sort slot positions by the edge id they hold;
    # real edge ids are unique, sentinel (E_pad-1) repeats — searchsorted
    # over the sorted ids finds each edge's slot.
    order = jnp.argsort(flat_ids)
    sorted_ids = jnp.take(flat_ids, order)
    pos = jnp.searchsorted(sorted_ids, jnp.arange(e_pad, dtype=flat_ids.dtype))
    return jnp.take(order, jnp.clip(pos, 0, flat_ids.shape[0] - 1))

"""Algebraically-fused message round (the TPU fast path).

The generic round materializes per-edge tensors:

    z_e   = concat(x_c[c(e)], x_q[q(e)])          [B, E, 2H]   (gather+concat)
    m_e   = W1 @ relu(W0 @ z_e + b0) + b1         [B, E, H]    (two E-sized GEMMs)
    agg_r = sum_{e -> r} m_e                       [B, R, H]    (scatter)

Two identities make this cheap on an MXU (exact, not approximate):

1. **Split the concat GEMM**: W0 @ concat(a, b) = W0_top @ a + W0_bot @ b, so
   the first layer is applied to *node* tensors BEFORE the edge gather —
   O(B * nodes * H * MH) instead of O(B * edges * 2H * MH) GEMM volume, and
   the only edge-sized tensors left are elementwise (VPU) ops that XLA fuses
   with the gather.
2. **Aggregation commutes with the linear second layer**:
   sum_e (W1 @ relu(.) + b1) = W1 @ (sum_e relu(.)) + deg * b1, so the
   second GEMM also runs at node granularity.

Combined with the uniform-degree ELL slot tables (bounded degree <= 4 for
surface/toric Tanner graphs), a round becomes: 4 node-sized GEMMs + a
broadcast/gather + masked reshape-sum — no scatter, no edge-sized GEMM.
Requires sum aggregation (the BP default).  Exact-parity with the generic
cell is asserted in tests/test_fused.py via parameter conversion.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from tpugnn.configs.config import ModelConfig
from tpugnn.mp.propagate import NodeStates
from tpugnn.tanner.graph import TannerGraph

__all__ = ["FusedRoundCell", "convert_generic_round_params"]


class _FusedMessage(nn.Module):
    """One direction's fused message+aggregate: returns [B, rows, H]."""

    hidden: int
    msg_hidden: int
    dtype: jnp.dtype
    gather: str = "auto"  # take | onehot | auto (onehot on TPU)

    @nn.compact
    def __call__(self, x_dst, x_src_all, slot_src, slot_mask):
        """x_dst: [B, rows, H] destination-node states (dst endpoint of edges);
        x_src_all: [B, src_rows, H]; slot_src: i32[rows, D] source-node index
        per ELL slot; slot_mask: f32[rows, D]."""
        import jax

        h, mh = self.hidden, self.msg_hidden
        dt = self.dtype
        # params live in f32 regardless of compute dtype (bf16 master weights
        # break optimizer state + f32-checkpoint restore); cast at use
        f32 = jnp.float32
        w_dst = self.param("w_dst", nn.initializers.lecun_normal(), (h, mh), f32).astype(dt)
        w_src = self.param("w_src", nn.initializers.lecun_normal(), (h, mh), f32).astype(dt)
        b0 = self.param("b0", nn.initializers.zeros_init(), (mh,), f32).astype(dt)
        w_out = self.param("w_out", nn.initializers.lecun_normal(), (mh, h), f32).astype(dt)
        b_out = self.param("b_out", nn.initializers.zeros_init(), (h,), f32).astype(dt)

        gather = self.gather
        if gather == "auto":
            gather = "onehot" if jax.default_backend() == "tpu" else "take"

        y_dst = x_dst @ w_dst                     # [B, rows, MH]
        y_src = x_src_all @ w_src                 # [B, src_rows, MH]
        rows, d = slot_src.shape
        if gather == "onehot":
            # dynamic gathers are slow on TPU; the slot gather is a tiny
            # one-hot incidence matmul on the MXU instead (same trick as
            # the fused Pallas kernel)
            g = jax.nn.one_hot(
                slot_src.reshape(-1), x_src_all.shape[-2], dtype=dt
            )                                      # [rows*D, src_rows]
            y_src_slots = jnp.einsum(
                "es,...sf->...ef", g, y_src, preferred_element_type=jnp.float32
            ).astype(dt)
            y_src_slots = y_src_slots.reshape(
                y_src.shape[:-2] + (rows, d, y_src.shape[-1])
            )
        else:
            y_src_slots = jnp.take(y_src, slot_src.reshape(-1), axis=-2)
            y_src_slots = y_src_slots.reshape(
                y_src.shape[:-2] + slot_src.shape + (y_src.shape[-1],)
            )                                      # [B, rows, D, MH]
        z = nn.relu(y_dst[..., :, None, :] + y_src_slots + b0)
        hsum = jnp.sum(z * slot_mask[..., None], axis=-2)   # [B, rows, MH]
        deg = jnp.sum(slot_mask, axis=-1)                    # [rows] real degree
        return hsum @ w_out + deg[..., :, None] * b_out


class FusedRoundCell(nn.Module):
    """Drop-in twin of models.decoder.RoundCell using the fused algebra.

    Restrictions: sum aggregation, no edge attributes, TannerGraph (ELL
    tables) — exactly the flagship BP-decoder configuration.
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, state: NodeStates, graph: TannerGraph, syn_feat: jnp.ndarray):
        cfg = self.cfg
        if cfg.aggr != "sum":
            raise ValueError("fused backend requires aggr='sum'")
        if cfg.update != "mlp":
            raise ValueError("fused backend requires update='mlp' (use a "
                             "generic backend for GRU updates)")
        dtype = jnp.dtype(cfg.dtype)
        h = cfg.hidden

        # ELL slot -> source-node index tables (tiny; folded by XLA)
        src_q = jnp.take(graph.edge_qubit, graph.ell_check_edge)  # [M, Dc]
        src_c = jnp.take(graph.edge_check, graph.ell_qubit_edge)  # [N, Dq]

        agg_c = _FusedMessage(h, cfg.msg_hidden, dtype, name="msg_to_check")(
            state.check, state.qubit, src_q, graph.ell_check_mask
        )
        agg_q = _FusedMessage(h, cfg.msg_hidden, dtype, name="msg_to_qubit")(
            state.qubit, state.check, src_c, graph.ell_qubit_mask
        )

        def _mlp(widths, name):
            layers = []
            for i, w in enumerate(widths):
                if i:
                    layers.append(nn.relu)
                layers.append(nn.Dense(w, dtype=dtype, name=f"{name}_d{i}"))
            return nn.Sequential(layers, name=name)

        upd_c = _mlp((h, h), "update_check")
        upd_q = _mlp((h, h), "update_qubit")
        ln_c = nn.LayerNorm(dtype=dtype, name="ln_check")
        ln_q = nn.LayerNorm(dtype=dtype, name="ln_qubit")

        new_check = ln_c(
            state.check + upd_c(jnp.concatenate([state.check, agg_c, syn_feat], -1))
        )
        new_qubit = ln_q(
            state.qubit + upd_q(jnp.concatenate([state.qubit, agg_q], -1))
        )
        return NodeStates(check=new_check, qubit=new_qubit), None


def convert_generic_round_params(round_params: dict) -> dict:
    """Map a generic RoundCell param subtree onto FusedRoundCell's layout.

    Generic: msg_to_check_d0 (kernel [2H, MH], bias), msg_to_check_d1
    (kernel [MH, H], bias).  Fused: msg_to_check/{w_dst, w_src, b0, w_out,
    b_out} with w_dst = d0.kernel[:H] (x_check occupies the first half of
    the concat in the generic message fns for BOTH directions; x_qubit the
    second half).
    """
    out = dict(round_params)
    for dname in ("msg_to_check", "msg_to_qubit"):
        d0 = out.pop(f"{dname}_d0")
        d1 = out.pop(f"{dname}_d1")
        k0 = d0["kernel"]
        h = k0.shape[-2] // 2  # slice the input axis (works for per-round
        top, bot = k0[..., :h, :], k0[..., h:, :]  # stacked [R, 2H, MH] too)
        # generic message fns take concat([xc_e, xq_e]): first half is the
        # check endpoint. For msg_to_check the dst is the check; for
        # msg_to_qubit the dst is the qubit (second half).
        if dname == "msg_to_check":
            w_dst, w_src = top, bot
        else:
            w_dst, w_src = bot, top
        out[dname] = {
            "w_dst": w_dst,
            "w_src": w_src,
            "b0": d0["bias"],
            "w_out": d1["kernel"],
            "b_out": d1["bias"],
        }
    return out

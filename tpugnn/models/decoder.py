"""BP-style GNN decoder over the Tanner graph (flax.linen).

Architecture (the reference's `GNNDecoder(nn.Module)` family, SURVEY.md §2.1
C4, rebuilt TPU-first):

  embed:    syndrome bits (+/- encoded) + check-type one-hot -> check states;
            a learned embedding initializes qubit states
  rounds:   R identical (weight-tied, BP-like) or per-round-parameterized
            bipartite message rounds, run under ``lax.scan`` so XLA compiles
            ONE round body and keeps the whole iteration on-chip
            [SURVEY.md §3.1 hot loop; BASELINE.json "fixed message-round
            count ... fused into on-chip loops"]
  readout:  per-qubit error logits (ex, ez) and/or pooled logical-class
            logits (2k bits)

Every dense layer is an MXU GEMM batched over [B, nodes/edges]; the
gather/scatter backend is selected by ``ModelConfig.backend`` (see
tpugnn.mp.aggregate).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax.numpy as jnp

from tpugnn.configs.config import ModelConfig
from tpugnn.mp.propagate import NodeStates, bipartite_round
from tpugnn.tanner.graph import TannerGraph

__all__ = ["GNNDecoder", "DecoderOutput"]


class DecoderOutput(NamedTuple):
    qubit_logits: jnp.ndarray          # f32[B, n_pad, 2]  (ex, ez) logits
    logical_logits: Optional[jnp.ndarray]  # f32[B, 2k] class-bit logits


def _mlp(widths, dtype, name):
    layers = []
    for i, w in enumerate(widths):
        if i:
            layers.append(nn.relu)
        layers.append(nn.Dense(w, dtype=dtype, name=f"{name}_d{i}"))
    return nn.Sequential(layers, name=name)


class RoundCell(nn.Module):
    """One bipartite message round: edge MLPs + gated residual node updates."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, state: NodeStates, graph: TannerGraph, syn_feat: jnp.ndarray):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        h, mh = cfg.hidden, cfg.msg_hidden

        msg_q = _mlp((mh, h), dtype, "msg_to_qubit")
        msg_c = _mlp((mh, h), dtype, "msg_to_check")

        def message_to_qubit(xc_e, xq_e, _):
            return msg_q(jnp.concatenate([xc_e, xq_e], axis=-1))

        def message_to_check(xc_e, xq_e, _):
            return msg_c(jnp.concatenate([xc_e, xq_e], axis=-1))

        if cfg.update == "gru":
            # GRU node updates (the reference family's recurrent variant,
            # SURVEY.md C4 "MLP/GRU node updates"): the aggregated messages
            # (+ syndrome for checks) are the input, the node state is the
            # hidden state
            gru_c = nn.GRUCell(h, dtype=dtype, name="gru_check")
            gru_q = nn.GRUCell(h, dtype=dtype, name="gru_qubit")

            def update_check(x, agg):
                new, _ = gru_c(x, jnp.concatenate([agg, syn_feat], axis=-1))
                return new

            def update_qubit(x, agg):
                new, _ = gru_q(x, agg)
                return new

        else:
            upd_c = _mlp((h, h), dtype, "update_check")
            upd_q = _mlp((h, h), dtype, "update_qubit")
            ln_c = nn.LayerNorm(dtype=dtype, name="ln_check")
            ln_q = nn.LayerNorm(dtype=dtype, name="ln_qubit")

            def update_check(x, agg):
                # re-inject the syndrome every round (BP decoders condition
                # each iteration on the observed parities, not just the
                # initial state)
                inp = jnp.concatenate([x, agg, syn_feat], axis=-1)
                return ln_c(x + upd_c(inp))

            def update_qubit(x, agg):
                return ln_q(x + upd_q(jnp.concatenate([x, agg], axis=-1)))

        new_state = bipartite_round(
            graph,
            state,
            message_to_qubit=message_to_qubit,
            message_to_check=message_to_check,
            update_check=update_check,
            update_qubit=update_qubit,
            aggr=cfg.aggr,
            backend=cfg.backend,
        )
        return new_state, None


class GNNDecoder(nn.Module):
    """Full decoder: embed -> scan(R rounds) -> readout heads."""

    cfg: ModelConfig
    k: int  # number of logical qubits of the target code

    @nn.compact
    def __call__(self, graph: TannerGraph, syndrome: jnp.ndarray) -> DecoderOutput:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        batch = syndrome.shape[0]
        m_pad, n_pad = graph.n_checks_pad, graph.n_qubits_pad

        # mask *arrays* from the graph (not arange-vs-static) so the same
        # module body runs unchanged on shard-local graph views under
        # shard_map, where real-node counts differ per shard
        check_mask = graph.check_mask.astype(dtype)
        qubit_mask = graph.qubit_mask.astype(dtype)

        # --- embed -------------------------------------------------------
        s_pm = (2.0 * syndrome.astype(dtype) - 1.0) * check_mask  # +/-1, 0 on pads
        syn_feat = s_pm[..., None]                                # [B, m_pad, 1]
        is_x = jnp.broadcast_to(graph.check_is_x.astype(dtype), (batch, m_pad))
        pos_c = jnp.broadcast_to(
            graph.check_feat.astype(dtype), (batch,) + graph.check_feat.shape
        )
        check_in = jnp.concatenate(
            [
                jnp.stack(
                    [s_pm, is_x * check_mask, (1.0 - is_x) * check_mask], axis=-1
                ),
                pos_c,
            ],
            axis=-1,
        )
        x_c = _mlp((cfg.hidden, cfg.hidden), dtype, "embed_check")(check_in)

        # qubit states: embed the static node-identity features once and
        # broadcast over the batch
        xq0 = _mlp((cfg.hidden, cfg.hidden), dtype, "embed_qubit")(
            graph.qubit_feat.astype(dtype)
        )
        x_q = jnp.broadcast_to(xq0, (batch, n_pad, cfg.hidden))
        x_q = x_q * qubit_mask[:, None]

        state = NodeStates(check=x_c * check_mask[:, None], qubit=x_q)

        # --- R message rounds under scan ---------------------------------
        if cfg.backend == "fused":
            from tpugnn.models.fused_cell import FusedRoundCell

            cell_cls = FusedRoundCell
        else:
            cell_cls = RoundCell
        if cfg.remat:
            # rematerialize each round in the backward pass: activation
            # memory drops from O(R * B * edges * MH) to one round's worth
            cell_cls = nn.remat(cell_cls, prevent_cse=False)
        if cfg.weight_tied:
            scan = nn.scan(
                cell_cls,
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=(nn.broadcast, nn.broadcast),
                length=cfg.rounds,
            )
        else:
            scan = nn.scan(
                cell_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=(nn.broadcast, nn.broadcast),
                length=cfg.rounds,
            )
        state, _ = scan(cfg, name="rounds")(state, graph, syn_feat)

        # --- readout ------------------------------------------------------
        qubit_logits = None
        logical_logits = None
        if cfg.readout in ("per_qubit", "both"):
            width = 4 if cfg.qubit_head == "pauli4" else 2
            qubit_logits = nn.Dense(width, dtype=jnp.float32, name="head_qubit")(
                state.qubit
            )
        if cfg.readout in ("logical", "both"):
            from tpugnn.mp.aggregate import global_node_sum

            qsum = global_node_sum(graph, state.qubit, which="qubit")
            csum = global_node_sum(graph, state.check, which="check")
            pooled = jnp.concatenate(
                [qsum / graph.n_qubits, csum / graph.n_checks], axis=-1
            )
            logical_logits = _mlp((cfg.hidden, 2 * self.k), jnp.float32, "head_logical")(
                pooled
            )
        if qubit_logits is None:
            qubit_logits = jnp.zeros((batch, n_pad, 2), jnp.float32)
        return DecoderOutput(qubit_logits=qubit_logits, logical_logits=logical_logits)

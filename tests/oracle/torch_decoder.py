"""PyTorch twin of the GNN decoder, built the way the REFERENCE builds it.

BASELINE.json's parity target is "match the reference decoder's per-layer
activations (allclose)"; with the reference mount empty (SURVEY.md §0) this
torch implementation stands in: it reproduces the decoder forward using the
reference's own mechanics — `index_select` gathers for collect and
`index_add_` (torch_scatter-style scatter-add) for aggregation, per-op, no
fusion — and must agree with every tpugnn backend to f32 tolerance.

Parameters are injected from the flax model (generic RoundCell layout,
weight-tied), so agreement is end-to-end: embed -> R rounds -> both heads.
"""

from __future__ import annotations

import numpy as np
import torch

__all__ = ["TorchDecoder"]


def _t(x) -> torch.Tensor:
    return torch.from_numpy(np.asarray(x, np.float32))


class _MLP:
    def __init__(self, p0, p1):
        self.k0, self.b0 = _t(p0["kernel"]), _t(p0["bias"])
        self.k1, self.b1 = _t(p1["kernel"]), _t(p1["bias"])

    def __call__(self, x):
        return torch.relu(x @ self.k0 + self.b0) @ self.k1 + self.b1


class _LN:
    def __init__(self, p, eps=1e-6):
        self.scale, self.bias, self.eps = _t(p["scale"]), _t(p["bias"]), eps

    def __call__(self, x):
        mu = x.mean(-1, keepdim=True)
        var = x.var(-1, unbiased=False, keepdim=True)
        return (x - mu) / torch.sqrt(var + self.eps) * self.scale + self.bias


class TorchDecoder:
    """Reference-mechanics forward pass. Weight-tied rounds only."""

    def __init__(self, params, graph, rounds: int):
        p = params["params"]
        self.rounds = rounds
        g = graph
        self.m_pad, self.n_pad = g.n_checks_pad, g.n_qubits_pad
        self.n_checks, self.n_qubits = g.n_checks, g.n_qubits
        self.edge_check = torch.from_numpy(np.asarray(g.edge_check)).long()
        self.edge_qubit = torch.from_numpy(np.asarray(g.edge_qubit)).long()
        self.edge_mask = _t(g.edge_mask)[:, None]
        self.check_mask = _t(g.check_mask)
        self.qubit_mask = _t(g.qubit_mask)
        self.check_is_x = _t(g.check_is_x)

        self.embed = _MLP(p["embed_check_d0"], p["embed_check_d1"])
        self.embed_q = _MLP(p["embed_qubit_d0"], p["embed_qubit_d1"])
        self.check_feat = _t(g.check_feat)
        self.qubit_feat = _t(g.qubit_feat)
        r = p["rounds"]
        self.msg_q = _MLP(r["msg_to_qubit_d0"], r["msg_to_qubit_d1"])
        self.msg_c = _MLP(r["msg_to_check_d0"], r["msg_to_check_d1"])
        self.upd_c = _MLP(r["update_check_d0"], r["update_check_d1"])
        self.upd_q = _MLP(r["update_qubit_d0"], r["update_qubit_d1"])
        self.ln_c = _LN(r["ln_check"])
        self.ln_q = _LN(r["ln_qubit"])
        self.head_q = p["head_qubit"]
        self.head_l0, self.head_l1 = p.get("head_logical_d0"), p.get("head_logical_d1")

    @torch.no_grad()
    def forward(self, syndrome: np.ndarray):
        s = _t(syndrome)                       # [B, m_pad]
        b = s.shape[0]
        # --- embed (same math as GNNDecoder) ------------------------------
        s_pm = (2.0 * s - 1.0) * self.check_mask
        syn_feat = s_pm[..., None]
        is_x = self.check_is_x.expand(b, self.m_pad)
        check_in = torch.cat(
            [
                torch.stack(
                    [s_pm, is_x * self.check_mask, (1.0 - is_x) * self.check_mask],
                    -1,
                ),
                self.check_feat.expand(b, -1, -1),
            ],
            -1,
        )
        x_c = self.embed(check_in) * self.check_mask[:, None]
        x_q = self.embed_q(self.qubit_feat).expand(b, -1, -1) * self.qubit_mask[:, None]

        # --- R rounds, reference mechanics --------------------------------
        for _ in range(self.rounds):
            # collect: index_select per endpoint (the reference's __collect__)
            xc_e = x_c.index_select(1, self.edge_check) * self.edge_mask
            xq_e = x_q.index_select(1, self.edge_qubit) * self.edge_mask
            cat = torch.cat([xc_e, xq_e], -1)
            m_q = self.msg_q(cat) * self.edge_mask
            m_c = self.msg_c(cat) * self.edge_mask
            # scatter-aggregate: index_add (torch_scatter scatter_add twin)
            agg_q = torch.zeros(b, self.n_pad, m_q.shape[-1])
            agg_q.index_add_(1, self.edge_qubit, m_q)
            agg_c = torch.zeros(b, self.m_pad, m_c.shape[-1])
            agg_c.index_add_(1, self.edge_check, m_c)
            # update
            x_c = self.ln_c(
                x_c + self.upd_c(torch.cat([x_c, agg_c, syn_feat], -1))
            )
            x_q = self.ln_q(x_q + self.upd_q(torch.cat([x_q, agg_q], -1)))

        qubit_logits = x_q @ _t(self.head_q["kernel"]) + _t(self.head_q["bias"])
        logical_logits = None
        if self.head_l0 is not None:
            qsum = (x_q * self.qubit_mask[:, None]).sum(1) / self.n_qubits
            csum = (x_c * self.check_mask[:, None]).sum(1) / self.n_checks
            logical_logits = _MLP(self.head_l0, self.head_l1)(
                torch.cat([qsum, csum], -1)
            )
        return (
            qubit_logits.numpy(),
            None if logical_logits is None else logical_logits.numpy(),
        )

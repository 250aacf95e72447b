"""PallasDecoder: inference engine running the fused R-round kernel.

Drop-in for ``GNNDecoder.apply`` (same ``(params, graph, syndrome) ->
DecoderOutput`` signature, same flax parameter tree as the 'fused' backend),
but the message-round scan executes inside the single fused Pallas kernel
(tpugnn.kernels.fused_decoder) — embed and readout stay in XLA where they are
one GEMM each.  Forward-only: use backend='fused' for training, PallasDecoder
for decode / Monte-Carlo eval / serving.

Parameter conversion (flax tree -> kernel RoundWeights) happens inside the
traced function, so it folds into the compiled program at zero runtime cost.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpugnn.configs.config import ModelConfig
from tpugnn.kernels.fused_decoder import RoundWeights, decoder_rounds, make_operators
from tpugnn.models.decoder import DecoderOutput
from tpugnn.tanner.graph import TannerGraph

__all__ = ["PallasDecoder", "roundweights_from_flax"]


def roundweights_from_flax(rounds: dict) -> RoundWeights:
    """Map the 'fused'-backend round param subtree to kernel layout."""
    mc, mq = rounds["msg_to_check"], rounds["msg_to_qubit"]
    uc0, uc1 = rounds["update_check_d0"], rounds["update_check_d1"]
    uq0, uq1 = rounds["update_qubit_d0"], rounds["update_qubit_d1"]
    lnc, lnq = rounds["ln_check"], rounds["ln_qubit"]
    h = mc["w_dst"].shape[0]
    r2 = lambda v: v.reshape(1, -1)
    k0c = uc0["kernel"]  # [2H+1, H]: concat([state, agg, syn])
    k0q = uq0["kernel"]  # [2H, H]: concat([state, agg])
    return RoundWeights(
        wd_c=mc["w_dst"], ws_c=mc["w_src"], b0_c=r2(mc["b0"]),
        wo_c=mc["w_out"], bo_c=r2(mc["b_out"]),
        wd_q=mq["w_dst"], ws_q=mq["w_src"], b0_q=r2(mq["b0"]),
        wo_q=mq["w_out"], bo_q=r2(mq["b_out"]),
        uc_x=k0c[:h], uc_a=k0c[h : 2 * h], uc_s=k0c[2 * h :],
        uc_b0=r2(uc0["bias"]), uc_w1=uc1["kernel"], uc_b1=r2(uc1["bias"]),
        uq_x=k0q[:h], uq_a=k0q[h:], uq_b0=r2(uq0["bias"]),
        uq_w1=uq1["kernel"], uq_b1=r2(uq1["bias"]),
        lnc_scale=r2(lnc["scale"]), lnc_bias=r2(lnc["bias"]),
        lnq_scale=r2(lnq["scale"]), lnq_bias=r2(lnq["bias"]),
    )


def _mlp2(x, p0, p1):
    return jnp.maximum(x @ p0["kernel"] + p0["bias"], 0.0) @ p1["kernel"] + p1["bias"]


class PallasDecoder:
    """Functional twin of GNNDecoder(backend='fused') on the fused kernel.

    With ``trainable=True`` the round loop is wrapped in a custom VJP
    (kernel forward, rematerialized XLA backward), so ``apply`` composes
    with jax.grad and the training loop can ride the kernel.
    """

    def __init__(self, cfg: ModelConfig, k: int, *, interpret: bool | None = None,
                 trainable: bool = False, backward: str = "pallas",
                 schedule: tuple | None = None,
                 tile_batch: int | None = None):
        if not cfg.weight_tied:
            raise ValueError("PallasDecoder supports weight-tied rounds only")
        if cfg.aggr != "sum":
            raise ValueError("PallasDecoder requires aggr='sum'")
        if cfg.update != "mlp":
            raise ValueError("PallasDecoder requires update='mlp'")
        if backward not in ("pallas", "xla"):
            raise ValueError("backward must be 'pallas' or 'xla'")
        self.cfg = cfg
        self.k = k
        self.interpret = interpret
        self.trainable = trainable
        self.backward = backward
        # kernel schedule-variant override (exact rewrites only; None ->
        # fused_decoder.PROD_VARIANTS).  Used by bench/probe harnesses to
        # A/B candidate schedules like biggather.
        self.schedule = tuple(schedule) if schedule is not None else None
        # explicit inference batch tile, bypassing pick_block_batch — for
        # probing tiles beyond the calibrated VMEM estimate (raise
        # TPUGNN_VMEM_LIMIT_MB or fused_decoder._VMEM_LIMIT to match; the
        # TB=64 probe validated 100 MB scoped VMEM on v5e)
        self.tile_batch = tile_batch

    def apply(self, params, graph: TannerGraph, syndrome: jnp.ndarray) -> DecoderOutput:
        if not self.trainable:
            if self.schedule is not None and "rollgather" in self.schedule:
                # the roll kernel handles its own raster permute; it runs
                # from the batch layout (the raster take replaces the
                # tiled path's transpose savings)
                return self._apply_batched(params, graph, syndrome)
            return self._apply_tiled(params, graph, syndrome)
        if self.backward == "pallas":
            # the kernel-backed VJP also has a tiled entry point, so the
            # trainable path skips the four large state transposes (and
            # their adjoints) exactly like tiled inference does
            return self._apply_tiled(params, graph, syndrome, trainable=True)
        return self._apply_batched(params, graph, syndrome)

    def _apply_batched(self, params, graph: TannerGraph, syndrome: jnp.ndarray) -> DecoderOutput:
        cfg = self.cfg
        p = params["params"]
        batch = syndrome.shape[0]
        m_pad, n_pad = graph.n_checks_pad, graph.n_qubits_pad
        cm, qm = graph.check_mask, graph.qubit_mask

        # --- embed (identical math to GNNDecoder.__call__) ----------------
        s_pm = (2.0 * syndrome - 1.0) * cm
        syn_feat = s_pm[..., None]
        is_x = jnp.broadcast_to(graph.check_is_x, (batch, m_pad))
        pos_c = jnp.broadcast_to(graph.check_feat, (batch,) + graph.check_feat.shape)
        check_in = jnp.concatenate(
            [jnp.stack([s_pm, is_x * cm, (1.0 - is_x) * cm], axis=-1), pos_c],
            axis=-1,
        )
        x_c = _mlp2(check_in, p["embed_check_d0"], p["embed_check_d1"]) * cm[:, None]
        xq0 = _mlp2(graph.qubit_feat, p["embed_qubit_d0"], p["embed_qubit_d1"])
        x_q = jnp.broadcast_to(xq0, (batch, n_pad, cfg.hidden))
        x_q = x_q * qm[:, None]

        # --- fused kernel rounds ------------------------------------------
        w = roundweights_from_flax(p["rounds"])
        ops = make_operators(graph)
        if self.trainable:
            # Built fresh on every trace: the returned fn (and its
            # custom_vjp fwd/bwd) closes over operator arrays derived from
            # ``graph``, which are tracers when apply runs under jit — a
            # cross-trace cache would leak them into later retraces
            # (UnexpectedTracerError; hit by any jitted train step that
            # retraces).  Construction is trace-time Python, so rebuilding
            # costs nothing at runtime.
            if self.backward == "pallas":
                # fully kernel-backed VJP (fused forward AND backward)
                from tpugnn.kernels.fused_backward import kernel_trained_rounds

                diff_fn = kernel_trained_rounds(
                    ops, rounds=cfg.rounds, compute_dtype=cfg.dtype,
                    interpret=self.interpret,
                )
            else:
                # kernel forward, rematerialized XLA backward
                from tpugnn.kernels.fused_decoder import make_differentiable_rounds

                diff_fn = make_differentiable_rounds(
                    ops, rounds=cfg.rounds, compute_dtype=cfg.dtype,
                    interpret=self.interpret,
                )
            x_c, x_q = diff_fn(x_c, x_q, syn_feat, w)
        else:
            rolled = False
            if self.schedule is not None and "rollgather" in self.schedule:
                # raster roll-gather kernel (kernels/roll_gather.py): slot
                # gathers as cyclic shifts instead of one-hot GEMMs.  Plan
                # built host-side from the static graph name (arrays here
                # are tracers); shape guard falls back to the GEMM kernel
                # for non-default padding or non-surface codes.
                import jax.numpy as _jnp

                from tpugnn.kernels.roll_gather import (
                    decoder_rounds_roll,
                    plan_from_name,
                )

                built = plan_from_name(graph.name)
                if built is not None and built[1] is not None and \
                        built[0].n_checks_pad == graph.n_checks_pad and \
                        built[0].n_qubits_pad == graph.n_qubits_pad:
                    plan = built[1]
                    plan_arrays = tuple(_jnp.asarray(a) for a in (
                        plan.cell_of_check, plan.cell_of_qubit,
                        plan.mask_c, plan.mask_q, plan.deg_c, plan.deg_q))
                    static_plan = (plan.d, plan.l_pad, plan.offs_c,
                                   plan.offs_q)
                    x_c, x_q = decoder_rounds_roll(
                        x_c, x_q, syn_feat, plan_arrays, static_plan, w,
                        rounds=cfg.rounds, interpret=self.interpret,
                        compute_dtype=cfg.dtype,
                        slot_dtype=("bfloat16" if "slot16" in self.schedule
                                    else "float32"),
                        block_batch=self.tile_batch or 32,
                    )
                    rolled = True
            if not rolled:
                x_c, x_q = decoder_rounds(
                    x_c, x_q, syn_feat, ops, w,
                    rounds=cfg.rounds, interpret=self.interpret,
                    compute_dtype=cfg.dtype,
                )

        # --- readout -------------------------------------------------------
        qubit_logits = None
        logical_logits = None
        if cfg.readout in ("per_qubit", "both"):
            hq = p["head_qubit"]
            qubit_logits = x_q @ hq["kernel"] + hq["bias"]
        if cfg.readout in ("logical", "both"):
            qsum = jnp.sum(x_q * qm[:, None], axis=-2) / graph.n_qubits
            csum = jnp.sum(x_c * cm[:, None], axis=-2) / graph.n_checks
            pooled = jnp.concatenate([qsum, csum], axis=-1)
            logical_logits = _mlp2(pooled, p["head_logical_d0"], p["head_logical_d1"])
        if qubit_logits is None:
            qubit_logits = jnp.zeros((batch, n_pad, 2), jnp.float32)
        return DecoderOutput(qubit_logits=qubit_logits, logical_logits=logical_logits)

    def _apply_tiled(self, params, graph: TannerGraph, syndrome: jnp.ndarray,
                     *, trainable: bool = False) -> DecoderOutput:
        """Embed/rounds/readout in the kernel's tiled layout.

        Produces node states directly as [nblk, rows, TB, H], skipping the
        four large state transposes of the batched wrapper; only the small
        syndrome/logit tensors are ever transposed.  With ``trainable``,
        the rounds go through the kernel-backed VJP's tiled entry point
        (fused Pallas forward AND backward), composing with jax.grad.
        """
        import jax

        from tpugnn.kernels.fused_decoder import (
            decoder_rounds_tiled,
            pick_block_batch,
        )

        cfg = self.cfg
        p = params["params"]
        batch = syndrome.shape[0]
        m_pad, n_pad = graph.n_checks_pad, graph.n_qubits_pad
        cm, qm = graph.check_mask, graph.qubit_mask
        cdt = jnp.dtype(cfg.dtype)
        ops = make_operators(graph)
        if trainable:
            from tpugnn.kernels.fused_backward import train_block_batch

            tb = train_block_batch(ops, cfg.msg_hidden, cfg.dtype, batch,
                                   cfg.rounds)
        else:
            slots = max(ops[0].shape[0], ops[3].shape[0])
            tb = pick_block_batch(slots, cfg.msg_hidden, cdt.itemsize, batch)
            if self.schedule is not None and "biggather" in self.schedule:
                # biggather keeps a [D*rows, TB, MH] slot tensor live
                tb = min(tb, 16)
            if self.tile_batch is not None:
                tb = self.tile_batch
            while batch % tb:
                tb //= 2
        nblk = batch // tb
        w = roundweights_from_flax(p["rounds"])

        # syndrome -> tiled [nblk, M, TB] (small transpose)
        s_pm = ((2.0 * syndrome - 1.0) * cm).reshape(nblk, tb, m_pad)
        s_pm = s_pm.transpose(0, 2, 1)
        # tiled embed: features on the last axis, MLPs are layout-agnostic
        is_x = jnp.broadcast_to(
            graph.check_is_x[None, :, None] * cm[None, :, None], (nblk, m_pad, tb)
        )
        inv_x = jnp.broadcast_to(
            (1.0 - graph.check_is_x)[None, :, None] * cm[None, :, None],
            (nblk, m_pad, tb),
        )
        pos_c = jnp.broadcast_to(
            graph.check_feat[None, :, None, :],
            (nblk, m_pad, tb, graph.check_feat.shape[-1]),
        )
        check_in = jnp.concatenate(
            [jnp.stack([s_pm, is_x, inv_x], axis=-1), pos_c], axis=-1
        )
        xc_t = (
            _mlp2(check_in, p["embed_check_d0"], p["embed_check_d1"])
            * cm[None, :, None, None]
        )
        xq0 = _mlp2(graph.qubit_feat, p["embed_qubit_d0"], p["embed_qubit_d1"])
        xq_t = jnp.broadcast_to(
            (xq0 * qm[:, None])[None, :, None, :], (nblk, n_pad, tb, cfg.hidden)
        )

        if trainable:
            # see _apply_batched for why this is rebuilt on every trace
            from tpugnn.kernels.fused_backward import kernel_trained_rounds_tiled

            core_t = kernel_trained_rounds_tiled(
                ops, rounds=cfg.rounds, compute_dtype=cfg.dtype,
                interpret=self.interpret,
            )
            xc_o, xq_o = core_t(xc_t, xq_t, s_pm, w)
        else:
            syn_ucs = (s_pm[..., None] * w.uc_s[0]).astype(cdt)
            xc_o, xq_o = decoder_rounds_tiled(
                xc_t.astype(cdt), xq_t.astype(cdt), syn_ucs, ops, w,
                rounds=cfg.rounds, interpret=self.interpret,
                compute_dtype=cfg.dtype, ablate=self.schedule,
            )

        qubit_logits = None
        logical_logits = None
        if cfg.readout in ("per_qubit", "both"):
            hq = p["head_qubit"]
            ql_t = xq_o @ hq["kernel"] + hq["bias"]       # [nblk, N, TB, w]
            qubit_logits = ql_t.transpose(0, 2, 1, 3).reshape(
                batch, n_pad, ql_t.shape[-1]
            )
        if cfg.readout in ("logical", "both"):
            qsum = jnp.sum(xq_o * qm[None, :, None, None], axis=1)   # [nblk, TB, H]
            csum = jnp.sum(xc_o * cm[None, :, None, None], axis=1)
            pooled = jnp.concatenate(
                [qsum / graph.n_qubits, csum / graph.n_checks], axis=-1
            ).reshape(batch, -1)
            logical_logits = _mlp2(pooled, p["head_logical_d0"], p["head_logical_d1"])
        if qubit_logits is None:
            qubit_logits = jnp.zeros((batch, n_pad, 2), jnp.float32)
        return DecoderOutput(qubit_logits=qubit_logits, logical_logits=logical_logits)

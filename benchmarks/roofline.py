"""Speed-of-light model for the decode step + %SoL reporting.

BASELINE.md defines per-chip speed-of-light as
``max(HBM gather-scatter bandwidth bound, MXU edge-MLP FLOP bound)``.
This module computes both bounds analytically from the graph/model config
and compares measured step times against them.

TPU v5e (1 chip) assumptions (public figures):
    MXU:  197 TFLOP/s bf16, 98.5 TFLOP/s f32
    HBM:  819 GB/s
"""

from __future__ import annotations

from dataclasses import dataclass

V5E_BF16_FLOPS = 197e12
V5E_F32_FLOPS = 98.5e12
V5E_HBM_BPS = 819e9
# Effective slot-stage (VMEM-resident gather/reduce) bandwidth, calibrated
# from the round-3 representation sweep (PERF_NOTES "Round 3"): one-hot
# GEMM gathers, roll-f32 gathers and roll-bf16 gathers all plateau at
# ~16.5 ms for ~30 GB of modeled slot-stage traffic at the flagship shape
# — ~1.8 TB/s regardless of whether the bytes move through the MXU or the
# VPU.  This is an EMPIRICAL constant, not a spec number; it turns the
# old "gathers are free" FLOP floor into an achievable-floor estimate.
V5E_SLOT_BPS = 1.8e12


@dataclass
class DecodeCost:
    flops: float            # total FLOPs per decode step
    hbm_bytes: float        # minimum HBM traffic per decode step
    t_flops: float          # seconds, MXU-bound
    t_hbm: float            # seconds, HBM-bound
    t_sol: float            # max of the two (gathers counted free)
    slot_bytes: float = 0.0  # slot-stage VMEM traffic per step
    t_slot: float = 0.0      # seconds at the calibrated slot bandwidth
    t_sol_mem: float = 0.0   # achievable floor incl. the slot stage

    def pct_sol(self, measured_s: float) -> float:
        """Headline %SoL vs the gathers-free floor (metric continuity —
        this is the figure every BENCH_r* reports)."""
        return 100.0 * self.t_sol / measured_s

    def pct_sol_mem(self, measured_s: float) -> float:
        """%SoL vs the achievable floor including the slot-stage traffic
        term (round-3 calibration) — what a perfect schedule could reach
        without restructuring the algorithm."""
        return 100.0 * self.t_sol_mem / measured_s


def fused_decode_cost(
    *, batch: int, m_pad: int, n_pad: int, deg_c: int, deg_q: int,
    hidden: int, msg_hidden: int, rounds: int, bytes_per_el: int = 2,
    peak_flops: float = V5E_BF16_FLOPS, hbm_bps: float = V5E_HBM_BPS,
) -> DecodeCost:
    """Cost model for the algebraically-fused round (models/fused_cell.py).

    Per round per sample:
      message dir->check: M*H*MH + N*H*MH (node GEMMs) + M*Dc*N*? -- the slot
      gather is a one-hot matmul in the Pallas kernel (M*Dc*N*MH) but an XLA
      gather (0 FLOPs) in the fused XLA path; we count the GEMM-free variant
      as the FLOP floor.
      second layer: M*MH*H; update MLPs: 2*(2H*H + H*H) per node set.
    """
    h, mh = hidden, msg_hidden
    msg = (m_pad * h * mh + n_pad * h * mh + m_pad * mh * h) + (
        n_pad * h * mh + m_pad * h * mh + n_pad * mh * h
    )
    upd = m_pad * (2 * h * h + h * h + h * h) + n_pad * (2 * h * h + h * h)
    flops = 2.0 * batch * rounds * (msg + upd)

    # HBM floor: states in/out once (fused kernel) + per-round node tensors
    # for the XLA path; report the kernel floor (states + weights once).
    state_bytes = batch * (m_pad + n_pad) * h * bytes_per_el * 2  # in + out
    weight_bytes = (4 * h * mh + 2 * mh * h + 8 * h * h) * bytes_per_el
    hbm = state_bytes + weight_bytes
    t_f = flops / peak_flops
    t_h = hbm / hbm_bps
    # slot-stage traffic (representation-independent plateau, PERF_NOTES
    # round 3): per round each direction streams its source panel once per
    # slot plus ~3 passes over the destination accumulation (f32 VPU)
    slot = 4.0 * batch * rounds * (
        deg_c * n_pad * mh + 3 * m_pad * mh
        + deg_q * m_pad * mh + 3 * n_pad * mh
    )
    t_s = slot / V5E_SLOT_BPS
    return DecodeCost(flops=flops, hbm_bytes=hbm, t_flops=t_f, t_hbm=t_h,
                      t_sol=max(t_f, t_h),
                      slot_bytes=slot, t_slot=t_s,
                      t_sol_mem=max(t_f + t_s, t_h))

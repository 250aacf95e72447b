"""Probe: fused-kernel batch-tile (TB) sweep on the real chip.

The kernel's VMEM auto-sizer (kernels/fused_decoder.pick_block_batch)
defaults to a conservative coefficient that lands on TB=8 for the flagship
d=11/H=128 config; PERF_NOTES.md flags TB=16 as the next lever (wider GEMM
panels -> better MXU utilization) if the ~2 MB extra VMEM headroom exists.
This sweep pins TB explicitly and times the decode step chained (see
PERF_NOTES.md on tunnel completion-poll amortization).  Mosaic VMEM
overflows are caught and reported, not fatal.

    python benchmarks/probe_tb.py [--tbs 4 8 16 32]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tpugnn.utils.timing import hard_sync


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tbs", type=int, nargs="+", default=[4, 8, 16, 32])
    ap.add_argument("--d", type=int, default=11)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--chain", type=int, default=10)
    ap.add_argument("--dtype", default="bfloat16",
                    help="kernel compute dtype (bfloat16 | float32)")
    ap.add_argument("--vmem-mb", type=int, default=None,
                    help="override the kernel's Mosaic scoped-VMEM ceiling")
    args = ap.parse_args()

    import tpugnn.kernels.fused_decoder as fd
    from tpugnn.configs import ModelConfig
    from tpugnn.eval.ler import decode_corrections
    from tpugnn.models import GNNDecoder
    from tpugnn.models.pallas_decoder import PallasDecoder
    from tpugnn.sampling import sample_batch
    from tpugnn.tanner import build_code

    graph = build_code("surface", args.d)
    if args.vmem_mb is not None:
        fd._VMEM_LIMIT = args.vmem_mb * 1024 * 1024
    cfg = ModelConfig(hidden=args.hidden, msg_hidden=args.hidden,
                      rounds=args.rounds, backend="fused",
                      readout="per_qubit", dtype=args.dtype)
    model = GNNDecoder(cfg, k=graph.k)
    key = jax.random.PRNGKey(0)
    params = model.init(key, graph, jnp.zeros((2, graph.n_checks_pad)))
    b = sample_batch(key, graph, 0.05, args.batch)
    pd = PallasDecoder(cfg, k=graph.k)
    edges = args.batch * graph.n_edges * args.rounds

    orig_pick = fd.pick_block_batch
    ref = None
    for tb in args.tbs:
        fd.pick_block_batch = lambda *a, tb=tb, **k: tb

        @jax.jit
        def decode(params, syndrome):
            out = pd.apply(params, graph, syndrome)
            return decode_corrections(out.qubit_logits)

        try:
            out = decode(params, b.syndrome)
            hard_sync(out)
            # reference correctness check once per TB against TB=4's output
            if ref is None:
                ref = jax.device_get(out)
            else:
                import numpy as np

                np.testing.assert_array_equal(jax.device_get(out), ref)
            ts = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                for _ in range(args.chain):
                    out = decode(params, b.syndrome)
                hard_sync(out)
                ts.append((time.perf_counter() - t0) / args.chain)
            t = statistics.median(ts)
            print(json.dumps({"tb": tb, "step_ms": round(t * 1e3, 2),
                              "medges_per_s": round(edges / t / 1e6, 1)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"tb": tb, "error": f"{type(e).__name__}: {str(e)[:300]}"}),
                  flush=True)
        finally:
            fd.pick_block_batch = orig_pick
    return 0


if __name__ == "__main__":
    sys.exit(main())

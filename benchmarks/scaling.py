"""Scaling-efficiency harness: edges/s vs mesh size (BASELINE target >= 90%).

Measures the sharded decode step on growing ('data', 'graph') meshes and
reports efficiency relative to linear scaling from 1 device:

    efficiency(N) = edges_per_s(N) / (N * edges_per_s(1))

On real multi-chip hardware this is the BASELINE.json scaling metric
(1 chip -> v5e-16, target >= 90%).

**CPU-emulation caveat (docs/SCALING.md)**: with
``--xla_force_host_platform_device_count=N`` all N "devices" share the SAME
physical host cores, so total compute throughput is bounded by the host no
matter how many virtual devices exist — the naive efficiency above is
expected to collapse toward 1/N even for perfectly parallel programs and
says nothing about ICI.  The meaningful emulation signal is the
**aggregate-throughput ratio** (total edges/s at N vs at 1, also reported):
it isolates genuine sharding overheads (collectives, halo buffers, padding)
from the shared-host artifact.  Hardware projections live in
benchmarks/ici_projection.py.

Modes: default is strong scaling (fixed global batch); ``--weak`` grows the
global batch with the mesh so per-device work is constant (the regime the
north-star multi-chip story actually runs in: more chips -> more shots/s at
fixed d, or bigger d at fixed latency).

    python benchmarks/scaling.py [--cpu] [--d 11] [--batch 4096]
        [--sizes 1 2 4 8] [--weak]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--d", type=int, default=11)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--sizes", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--graph-axis", type=int, default=2,
                    help="graph-axis size for meshes with >= this many devices")
    ap.add_argument("--weak", action="store_true",
                    help="weak scaling: global batch = --batch * n_devices "
                         "(constant per-device work)")
    args = ap.parse_args()
    if args.cpu:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.setdefault(
            "XLA_FLAGS",
            f"--xla_force_host_platform_device_count={max(args.sizes)}",
        )
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tpugnn.configs import ModelConfig, MeshConfig
    from tpugnn.dist import build_partitioned_code, make_mesh, make_sharded_apply
    from tpugnn.eval.ler import decode_corrections
    from tpugnn.models import GNNDecoder
    from tpugnn.sampling import sample_batch
    from tpugnn.utils.metrics import Timer

    results = []
    base = None
    for n in args.sizes:
        if n > len(jax.devices()):
            break
        ga = args.graph_axis if n % args.graph_axis == 0 and n >= args.graph_axis else 1
        mcfg = MeshConfig(data=n // ga, graph=ga)
        mesh = make_mesh(mcfg, n_devices=n)
        graph, pg = build_partitioned_code("surface", args.d, ga)
        cfg = ModelConfig(hidden=args.hidden, msg_hidden=args.hidden,
                          rounds=args.rounds, readout="per_qubit")
        model = GNNDecoder(cfg, k=graph.k)
        key = jax.random.PRNGKey(0)
        params = model.init(key, graph, jnp.zeros((2, graph.n_checks_pad)))
        batch = args.batch * n if args.weak else args.batch
        b = sample_batch(key, graph, 0.05, batch)
        apply = make_sharded_apply(model, mesh, pg)

        @jax.jit
        def decode(params, s):
            return decode_corrections(apply(params, graph, s).qubit_logits)

        t = Timer.time_fn(decode, params, b.syndrome, iters=5)
        eps = batch * graph.n_edges * args.rounds / t
        if base is None:
            base = eps
        # efficiency: classic per-device speedup vs linear (collapses to
        # ~1/N on a shared-host emulated mesh — see module docstring);
        # aggregate_ratio: total throughput at N vs 1 device, the signal
        # that isolates genuine sharding overhead under emulation
        results.append({
            "devices": n, "mesh": [mcfg.data, mcfg.graph],
            "batch": batch, "mode": "weak" if args.weak else "strong",
            "step_ms": round(t * 1e3, 3),
            "edges_per_s": round(eps, 1),
            "efficiency": round(eps / (n * base), 4),
            "aggregate_ratio": round(eps / base, 4),
        })
    print(json.dumps({
        "metric": "scaling_efficiency",
        "host_emulation": jax.default_backend() == "cpu",
        "runs": results,
    }))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())

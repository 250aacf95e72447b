"""Confidence-gate (tau) sweep for the GNN+classical cleanup hybrids.

The cleanup hybrids keep only GNN qubit flips whose posterior confidence
exceeds ``tau`` and hand the rest to the classical matcher
[tpugnn/eval/hybrid.py].  The 1M-shot table runs ungated (tau=None); this
probe asks whether gating buys LER at the flagship distance — low-
confidence GNN mistakes create long residual strings that hurt the
matcher most exactly where d=11 parity is at stake.

    python benchmarks/tau_sweep.py --ckpt runs/v3_surface_d11 --d 11 \
        --taus 0 0.7 0.9 0.95 0.99 --ps 0.02 0.03 --shots 200000
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="runs/v3_surface_d11")
    ap.add_argument("--family", default="surface")
    ap.add_argument("--d", type=int, default=11)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--rounds", type=int, default=14)
    ap.add_argument("--taus", type=float, nargs="+",
                    default=[0.0, 0.7, 0.9, 0.95, 0.99])
    ap.add_argument("--ps", type=float, nargs="+", default=[0.02, 0.03])
    ap.add_argument("--shots", type=int, default=200000)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from tpugnn.configs import CodeConfig, ExperimentConfig, ModelConfig
    from tpugnn.eval.hybrid import ler_all_columns
    from tpugnn.tanner import build_code
    from tpugnn.train.checkpoint import CheckpointManager
    from tpugnn.train.loop import init_state

    graph = build_code(args.family, args.d)
    cfg = ExperimentConfig(
        code=CodeConfig(family=args.family, distance=args.d),
        model=ModelConfig(hidden=args.hidden, msg_hidden=args.hidden,
                          rounds=args.rounds, backend="fused",
                          qubit_head="pauli4"),
    )
    state, model = init_state(cfg, graph)
    restored = CheckpointManager(args.ckpt).restore_latest(state)
    if restored is None:
        print(f"no checkpoint in {args.ckpt}", file=sys.stderr)
        return 1
    if jax.default_backend() == "tpu":
        from tpugnn.models.pallas_decoder import PallasDecoder

        apply_fn = PallasDecoder(cfg.model, k=graph.k).apply
    else:
        apply_fn = model.apply

    for p in args.ps:
        for tau in args.taus:
            t = None if tau == 0.0 else tau
            u = ler_all_columns(
                apply_fn, restored.params, graph, p=p, shots=args.shots,
                batch=4096, key=jax.random.PRNGKey(777), tau=t,
                with_mwpm_raw=True,
            )
            print(json.dumps({
                "p": p, "tau": tau, "shots": u["shots"],
                "gnn_uf": u["gnn_uf"], "gnn_mwpm": u["gnn_mwpm"],
                "gnn_best_of": u["gnn_best_of"], "mwpm": u["mwpm"],
                "ler_hybrid": u.get("ler_hybrid"), "picked": u["picked"],
            }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

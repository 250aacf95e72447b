"""Command-line interface (the reference's argparse ``__main__``, C7).

    python -m tpugnn.cli train --family surface -d 3 -p 0.05 --steps 2000
    python -m tpugnn.cli eval  --family surface -d 5 -p 0.03 --shots 100000 \
        --checkpoint-dir runs/d5
    python -m tpugnn.cli sweep --family surface -d 3 -d 5 -p 0.01 -p 0.03

Every flag maps onto a field of the frozen config dataclasses
(tpugnn.configs); the CLI is a thin parser, all logic lives in the library.
"""

from __future__ import annotations

import argparse
import json
import sys

from tpugnn.configs import CodeConfig, ExperimentConfig, ModelConfig, TrainConfig

__all__ = ["main", "build_config"]


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--family", default="surface", choices=["surface", "toric", "repetition", "steane"])
    p.add_argument("-d", "--distance", type=int, default=3)
    p.add_argument("-p", "--error-rate", type=float, default=0.05)
    p.add_argument("--hidden", type=int, default=128)
    p.add_argument("--msg-hidden", type=int, default=128)
    p.add_argument("--rounds", type=int, default=8)
    p.add_argument("--backend", default="segment", choices=["segment", "dense", "ell", "fused", "pallas"])
    p.add_argument("--aggr", default="sum", choices=["sum", "mean", "max"])
    p.add_argument("--per-round-weights", action="store_true")
    p.add_argument("--readout", default="both", choices=["per_qubit", "logical", "both"])
    p.add_argument("--qubit-head", default="bits", choices=["bits", "pauli4"])
    p.add_argument("--remat", action="store_true",
                   help="per-round activation rematerialization (large-d training)")
    p.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--eval-every", type=int, default=500)
    p.add_argument("--eval-shots", type=int, default=4096)
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--p-mix", type=float, nargs=2, default=None,
                   metavar=("LO", "HI"),
                   help="per-shot training noise rate ~ Uniform[LO, HI]")
    p.add_argument("--dt", type=int, default=1,
                   help="syndrome-measurement rounds; >1 decodes a "
                        "spacetime detector graph (see --noise)")
    p.add_argument("--sector", default="z", choices=["z", "x"],
                   help="CSS sector of the --noise circuit detector graph")
    p.add_argument("--noise", default="phenomenological",
                   choices=["phenomenological", "circuit"],
                   help="spacetime noise model for --dt > 1: independent "
                        "data/measurement faults, or full circuit-level "
                        "faults (CNOT depolarizing, hooks; surface only)")
    p.add_argument("--meas-ratio", type=float, default=1.0,
                   help="measurement-fault rate relative to data-fault rate "
                        "(phenomenological noise only)")
    p.add_argument("--cpu", action="store_true", help="force the CPU platform")


def build_config(args: argparse.Namespace) -> ExperimentConfig:
    return ExperimentConfig(
        code=CodeConfig(
            family=args.family, distance=args.distance, p=args.error_rate
        ),
        model=ModelConfig(
            hidden=args.hidden,
            msg_hidden=args.msg_hidden,
            rounds=args.rounds,
            backend=args.backend,
            aggr=args.aggr,
            weight_tied=not args.per_round_weights,
            readout=args.readout,
            qubit_head=args.qubit_head,
            remat=args.remat,
            dtype=args.dtype,
        ),
        train=TrainConfig(
            batch=args.batch,
            steps=args.steps,
            lr=args.lr,
            seed=args.seed,
            eval_every=args.eval_every,
            eval_shots=args.eval_shots,
            checkpoint_dir=args.checkpoint_dir,
            p_mix=tuple(args.p_mix) if args.p_mix else None,
        ),
    )


def _force_cpu() -> None:
    import os

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="tpugnn", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name in ("train", "eval", "sweep", "serve"):
        sp = sub.add_parser(name)
        _add_common(sp)
        if name == "eval":
            sp.add_argument("--shots", type=int, default=100_000)
        if name == "sweep":
            sp.add_argument("--shots", type=int, default=20_000)
            sp.add_argument("--ps", type=float, nargs="+", default=[0.01, 0.03, 0.05, 0.08])
            sp.add_argument("--baseline", action="store_true",
                            help="also report union-find + exact-MWPM "
                                 "decoder LER per p")
        if name in ("eval", "sweep"):
            sp.add_argument("--cleanup", default=None,
                            choices=["uf", "mwpm", "best_of"],
                            help="also report the GNN+cleanup hybrid LER "
                                 "(per-qubit correction + classical repair "
                                 "of the residual syndrome; best_of = "
                                 "per-shot min-weight MAP over GNN/cleanup/"
                                 "MWPM candidates)")
            sp.add_argument("--tau", type=float, default=None,
                            help="confidence gate for --cleanup (keep GNN "
                                 "flips with posterior max-prob >= tau)")
        if name == "serve":
            sp.add_argument("--in", dest="infile", default=None,
                            help=".npy uint8 [B, m] syndromes (default: "
                                 "sample a demo batch at -p)")
            sp.add_argument("--out", dest="outfile", default=None,
                            help=".npy uint8 [B, n, 2] corrections "
                                 "(default: <in>.corrections.npy or stdout "
                                 "summary only)")
            sp.add_argument("--max-batch", type=int, default=4096)
            sp.add_argument("--cleanup", default=None,
                            choices=["uf", "mwpm", "best_of"],
                            help="serve the GNN+classical hybrid (classical "
                                 "repair of the residual syndrome; best_of "
                                 "= per-shot min-weight MAP over GNN/"
                                 "cleanup/MWPM candidates)")
            sp.add_argument("--tau", type=float, default=None,
                            help="confidence gate for --cleanup")
            sp.add_argument("--lazy", action="store_true",
                            help="best_of only: run the raw-MWPM matcher "
                                 "only on shots whose GNN correction is "
                                 "syndrome-inconsistent (approximate; see "
                                 "DecodeEngine docs)")
    args = ap.parse_args(argv)
    if args.cpu:
        _force_cpu()

    import jax

    from tpugnn.eval import ler_monte_carlo
    from tpugnn.train import train as train_fn
    from tpugnn.train.loop import init_state
    from tpugnn.tanner import build_code

    cfg = build_config(args)

    def _graph():
        if args.dt > 1:
            if args.noise == "circuit":
                from tpugnn.tanner.circuit import build_circuit_code

                return build_circuit_code(cfg.code.family, cfg.code.distance,
                                          args.dt, sector=args.sector)
            from tpugnn.tanner.spacetime import build_spacetime_code

            return build_spacetime_code(cfg.code.family, cfg.code.distance,
                                        args.dt, meas_ratio=args.meas_ratio)
        return build_code(cfg.code.family, cfg.code.distance)

    if args.cmd == "train":
        _, _, _, history = train_fn(cfg, graph=_graph())
        print(json.dumps(history[-1] if history else {}))
        return 0

    if args.cmd == "serve":
        import time

        import numpy as np

        from tpugnn.serve import DecodeEngine

        graph = _graph()
        if cfg.train.checkpoint_dir:
            from tpugnn.train.checkpoint import CheckpointManager

            state, _ = init_state(cfg, graph)
            restored = CheckpointManager(cfg.train.checkpoint_dir).restore_latest(state)
            if restored is None:
                print("no checkpoint found; serving fresh params", file=sys.stderr)
            else:
                state = restored
        else:
            state, _ = init_state(cfg, graph)
        eng = DecodeEngine(cfg, state.params, graph, max_batch=args.max_batch,
                           cleanup=args.cleanup, cleanup_tau=args.tau,
                           lazy=getattr(args, "lazy", False))
        if args.infile:
            syn = np.load(args.infile)
        else:
            from tpugnn.sampling import sample_batch

            b = sample_batch(jax.random.PRNGKey(cfg.train.seed), graph,
                             cfg.code.p, args.max_batch)
            syn = np.asarray(b.syndrome[:, : graph.n_checks], np.uint8)
        t0 = time.perf_counter()
        corr = eng.decode(syn)
        dt_s = time.perf_counter() - t0
        out = args.outfile or (f"{args.infile}.corrections.npy" if args.infile else None)
        if out:
            np.save(out, corr)
        print(json.dumps({
            "shots": int(syn.shape[0]),
            "decode_s": round(dt_s, 4),
            "shots_per_s": round(syn.shape[0] / dt_s, 1),
            "mean_correction_weight": float(corr.sum(axis=(1, 2)).mean()),
            **({"out": out} if out else {}),
        }))
        return 0

    if args.cmd in ("eval", "sweep"):
        graph = _graph()
        if cfg.train.checkpoint_dir:
            state, model = init_state(cfg, graph)
            from tpugnn.train.checkpoint import CheckpointManager

            mgr = CheckpointManager(cfg.train.checkpoint_dir)
            restored = mgr.restore_latest(state)
            if restored is None:
                print("no checkpoint found; evaluating fresh params", file=sys.stderr)
            else:
                state = restored
        else:
            state, model, graph, _ = train_fn(cfg, graph=graph)
        ps = args.ps if args.cmd == "sweep" else [cfg.code.p]
        for p in ps:
            ev = ler_monte_carlo(
                model.apply, state.params, graph,
                p=p, shots=args.shots, batch=min(args.shots, 4096),
                key=jax.random.PRNGKey(cfg.train.seed + 99),
            )
            row = {"family": cfg.code.family, "d": cfg.code.distance,
                   "p": p, **{k: ev[k] for k in ("ler", "ler_stderr", "shots")},
                   **({"ler_logical": ev["ler_logical"]} if "ler_logical" in ev else {})}
            if getattr(args, "cleanup", None):
                from tpugnn.eval.hybrid import ler_best_of, ler_gnn_cleanup

                if args.cleanup == "best_of":
                    hy = ler_best_of(
                        model.apply, state.params, graph, p=p,
                        shots=args.shots, batch=min(args.shots, 4096),
                        tau=args.tau,
                        key=jax.random.PRNGKey(cfg.train.seed + 99))
                else:
                    hy = ler_gnn_cleanup(
                        model.apply, state.params, graph, p=p,
                        shots=args.shots, batch=min(args.shots, 4096),
                        cleanup=args.cleanup, tau=args.tau,
                        key=jax.random.PRNGKey(cfg.train.seed + 99))
                row[f"gnn_{args.cleanup}_ler"] = hy["ler"]
            if getattr(args, "baseline", False):
                from tpugnn.eval.baseline import ler_mwpm, ler_union_find

                uf = ler_union_find(graph, p=p, shots=args.shots,
                                    batch=min(args.shots, 4096),
                                    key=jax.random.PRNGKey(cfg.train.seed + 7))
                row["uf_ler"] = uf["ler"]
                mw = ler_mwpm(graph, p=p, shots=args.shots,
                              batch=min(args.shots, 4096),
                              key=jax.random.PRNGKey(cfg.train.seed + 7))
                row["mwpm_ler"] = mw["ler"]
            print(json.dumps(row))
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())

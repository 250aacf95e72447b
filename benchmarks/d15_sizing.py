"""d=15+ scale demonstration + memory sizing (BASELINE configs[4] stand-in).

Real N>=2-host hardware is unavailable in this environment (one tunneled
chip), so the multi-host edge-partitioned d=15+ story is demonstrated the
way the task harness validates it: the FULL sharded training step (DP x
graph-partition mesh, boundary halo exchange) jit-compiles and executes on
an 8-virtual-device CPU mesh at d=13 and d=15, for both the all_to_all and
ring-ppermute halo modes — plus an analytic HBM budget for the flagship
decode/train configs at d=11..17 on a 16 GiB v5e chip.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/d15_sizing.py            # writes runs/d15_dryrun.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def hbm_budget(d: int, *, batch: int = 4096, hidden: int = 128,
               rounds: int = 14) -> dict:
    """Analytic HBM bytes for the flagship decode + kernel-bwd train step."""
    from tpugnn.tanner import build_code

    g = build_code("surface", d)
    rows = g.n_checks_pad + g.n_qubits_pad
    bf16, f32 = 2, 4
    state = batch * rows * hidden          # one copy of both node states
    # inference: in/out states + syndrome tile (bf16); weights negligible
    decode = 2 * state * bf16 + batch * g.n_checks_pad * hidden * bf16
    # kernel-bwd training: fwd stash (R round-input states, bf16, HBM) +
    # f32 grads/opt (params tiny) + batch residency
    stash = batch * rounds * rows * hidden * bf16
    train = stash + 3 * state * f32 + decode
    return {
        "d": d, "rows_padded": rows, "edges": int(g.n_edges),
        "decode_hbm_gib": round(decode / 2**30, 3),
        "train_stash_hbm_gib": round(stash / 2**30, 3),
        "train_total_hbm_gib": round(train / 2**30, 3),
        "fits_16gib_decode": decode < 15 * 2**30,
        "fits_16gib_train": train < 15 * 2**30,
    }


def main() -> int:
    from tpugnn.dist.api import dryrun

    out = {"n_devices": 8, "runs": [], "hbm_budget": []}
    for d, halo in ((13, "alltoall"), (15, "alltoall"), (15, "ring")):
        t0 = time.time()
        dryrun(8, distance=d, halo=halo)
        out["runs"].append({
            "distance": d, "halo": halo, "ok": True,
            "wall_s": round(time.time() - t0, 1),
            "mesh": "(data=2, graph=4)",
        })
        print(f"d={d} halo={halo}: sharded train step ok", flush=True)
    for d in (11, 13, 15, 17):
        out["hbm_budget"].append(hbm_budget(d))
    os.makedirs("runs", exist_ok=True)
    with open("runs/d15_dryrun.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["hbm_budget"], indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())

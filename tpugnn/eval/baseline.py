"""Monte-Carlo LER for classical baseline decoders (union-find).

Sampling and syndrome extraction stay on device (tpugnn.sampling); syndromes
cross to the host once per chunk for the native union-find decode, and the
failure check (residual logical parity) runs in numpy.  Used to put the GNN
decoder's LER curves in context, mirroring the reference's MWPM comparison
[SURVEY.md §2.1 C6].
"""

from __future__ import annotations

import jax
import numpy as np

from tpugnn.baselines.union_find import UnionFindDecoder
from tpugnn.sampling.noise import sample_batch
from tpugnn.tanner.graph import TannerGraph

__all__ = ["ler_union_find", "ler_bp", "ler_bp_osd", "ler_mwpm"]


def _ler_host(graph, dec, name, *, p, shots, batch, key) -> dict[str, float]:
    """Shared Monte-Carlo loop for host-side decoders (UF / OSD / MWPM):
    sample on device, decode on host, check residual syndrome + logical
    parity in numpy."""
    key = key if key is not None else jax.random.PRNGKey(0)
    n = graph.n_qubits
    hx = np.asarray(graph.h_syn_ez)[: graph.n_checks, :n]   # X-type rows
    hz = np.asarray(graph.h_syn_ex)[: graph.n_checks, :n]   # Z-type rows
    lx = np.asarray(graph.logicals_x)[:, :n]
    lz = np.asarray(graph.logicals_z)[:, :n]

    fails = 0
    syn_mismatch = 0
    total = 0
    for _ in range(max(1, (shots + batch - 1) // batch)):
        key, sub = jax.random.split(key)
        b = sample_batch(sub, graph, p, batch)
        ex = np.asarray(b.ex)[:, :n].astype(np.uint8)
        ez = np.asarray(b.ez)[:, :n].astype(np.uint8)
        ex_hat, ez_hat = dec.decode(np.asarray(b.syndrome))
        rx = (ex ^ ex_hat) & 1
        rz = (ez ^ ez_hat) & 1
        # residual syndrome must vanish (every baseline reproduces it by design)
        sm = ((rx @ hz.T) % 2).any(axis=1) | ((rz @ hx.T) % 2).any(axis=1)
        lf = ((rx @ lz.T) % 2).any(axis=1) | ((rz @ lx.T) % 2).any(axis=1)
        fails += int(np.sum(sm | lf))
        syn_mismatch += int(np.sum(sm))
        total += batch
    ler = fails / total
    return {
        "ler": ler,
        "ler_stderr": (max(ler * (1 - ler), 1e-12) / total) ** 0.5,
        "syn_mismatch_rate": syn_mismatch / total,
        "shots": float(total),
        "decoder": name,
    }


def ler_union_find(
    graph: TannerGraph,
    *,
    p: float,
    shots: int,
    batch: int = 4096,
    key: jax.Array | None = None,
    force_python: bool = False,
) -> dict[str, float]:
    dec = UnionFindDecoder(graph, force_python=force_python)
    return _ler_host(graph, dec, "union_find", p=p, shots=shots, batch=batch,
                     key=key)


def ler_mwpm(
    graph: TannerGraph,
    *,
    p: float,
    shots: int,
    batch: int = 4096,
    key: jax.Array | None = None,
    force_python: bool = False,
) -> dict[str, float]:
    """Monte-Carlo LER of exact minimum-weight perfect matching (the
    reference's canonical baseline [SURVEY.md §2.1 C6]).  On detector
    graphs with per-fault rates, matching is log-likelihood weighted."""
    from tpugnn.baselines.mwpm import MWPMDecoder

    dec = MWPMDecoder(graph, p=p, force_python=force_python)
    return _ler_host(graph, dec, "mwpm", p=p, shots=shots, batch=batch,
                     key=key)


def ler_bp(
    graph: TannerGraph,
    *,
    p: float,
    shots: int,
    batch: int = 4096,
    iters: int = 32,
    alpha: float = 0.8,
    key: jax.Array | None = None,
) -> dict[str, float]:
    """Monte-Carlo LER of the min-sum BP baseline, fully on-device.

    Unlike :func:`ler_union_find` (host round-trip into the C++ core), BP
    is a jitted TPU program end-to-end: sampling, decoding, residual
    syndrome + logical-parity checks all stay on device.
    """
    import functools

    import jax.numpy as jnp

    from tpugnn.baselines.bp import bp_decode
    from tpugnn.eval.ler import count_failures

    key = key if key is not None else jax.random.PRNGKey(0)

    @functools.partial(jax.jit, static_argnames=("batch_",))
    def chunk(k, batch_):
        b = sample_batch(k, graph, p, batch_)
        ex_hat, ez_hat = bp_decode(graph, b.syndrome, p, iters=iters,
                                   alpha=alpha)
        f = count_failures(graph, b, ex_hat, ez_hat, None)
        return jnp.sum(f["fail_qubit"]), jnp.sum(f["syn_mismatch"])

    fails = 0.0
    syn_mismatch = 0.0
    total = 0
    for _ in range(max(1, (shots + batch - 1) // batch)):
        key, sub = jax.random.split(key)
        fq, sm = chunk(sub, batch)
        fails += float(fq)
        syn_mismatch += float(sm)
        total += batch
    ler = fails / total
    return {
        "ler": ler,
        "ler_stderr": (max(ler * (1 - ler), 1e-12) / total) ** 0.5,
        "syn_mismatch_rate": syn_mismatch / total,
        "shots": float(total),
        "decoder": f"bp_minsum(iters={iters}, alpha={alpha})",
    }


def ler_bp_osd(
    graph: TannerGraph,
    *,
    p: float,
    shots: int,
    batch: int = 4096,
    iters: int = 32,
    alpha: float = 0.8,
    key: jax.Array | None = None,
    force_python: bool = False,
) -> dict[str, float]:
    """Monte-Carlo LER of BP + OSD-0 (device BP, native host OSD)."""
    from tpugnn.baselines.osd import BPOSDDecoder

    dec = BPOSDDecoder(graph, p=p, iters=iters, alpha=alpha,
                       force_python=force_python)
    return _ler_host(graph, dec, f"bp_osd0(iters={iters}, alpha={alpha})",
                     p=p, shots=shots, batch=batch, key=key)

"""GNN + classical-cleanup hybrid decoding.

The deployed hybrid rule in :mod:`tpugnn.eval.ler` falls back to the
logical-class head whenever the per-qubit correction is syndrome-
inconsistent.  This module implements the stronger decode-time rule
[SURVEY.md §2.1 C6 "MWPM/baseline comparison"; VERDICT r1 item 1]:

    e_hat = e_gnn  XOR  cleanup(s XOR H @ e_gnn)

i.e. the GNN removes the bulk of the error pattern and a classical decoder
(union-find or exact MWPM) repairs the *residual* syndrome, so the combined
correction is syndrome-consistent by construction and exploits the GNN's
per-qubit soft information instead of throwing it away on a mismatch.

Optionally the GNN correction is confidence-gated: with ``tau`` set, only
qubit flips whose posterior max-probability exceeds ``tau`` are kept (the
rest are left to the cleanup decoder), which protects the matcher from
low-confidence GNN mistakes that create long residual strings.

Everything device-side (sampling, GNN forward, residual syndrome) stays one
jitted program; only the classical cleanup runs host-side, exactly like the
pure classical baselines in :mod:`tpugnn.eval.baseline`.
"""

from __future__ import annotations

import contextlib
import json
import os
from functools import lru_cache
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from tpugnn.eval.ler import decode_corrections
from tpugnn.sampling.noise import sample_batch
from tpugnn.tanner.graph import TannerGraph

__all__ = ["gnn_cleanup_corrections", "ler_gnn_cleanup", "ler_best_of",
           "ler_all_columns", "logical_head_correction", "min_weight_select",
           "lazy_decode"]


def lazy_decode(dec, syn: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Run a classical decoder only on rows with a nonzero syndrome.

    Zero-syndrome rows map to the zero correction for both union-find and
    MWPM (no defects -> no clusters / no matching -> no flips), so this is
    EXACT, not approximate — asserted by tests/eval/test_hybrid.py.  For the
    residual-syndrome cleanup decodes the GNN leaves most shots with an
    empty residual, so this removes the per-shot matcher cost for the
    majority of the batch [VERDICT r2 weak 5 / task 4].
    """
    syn = np.asarray(syn)
    nz = np.flatnonzero(syn.any(axis=1))
    n = dec.graph.n_qubits
    ex = np.zeros((syn.shape[0], n), np.uint8)
    ez = np.zeros((syn.shape[0], n), np.uint8)
    if nz.size:
        exn, ezn = dec.decode(syn[nz])
        ex[nz] = exn.astype(np.uint8)
        ez[nz] = ezn.astype(np.uint8)
    return ex, ez


NLP_SCALE = 16.0  # uint8 neg-log-prob quantization: 1/16 nat per level


def min_weight_select(cand_names, cands, syn, hz, hx, *,
                      qubit_inconsistent: np.ndarray | None = None,
                      nlp: np.ndarray | None = None):
    """Per-shot minimum-cost selection over candidate corrections.

    ``cands`` maps name -> (ex, ez) uint8 [B, n]; ``syn`` is the observed
    syndrome uint8 [B, >=n_checks].  The cleanup/matcher candidates are
    syndrome-consistent by construction; the "qubit" and "logical" heads
    are consistency-gated (infinite weight on mismatch) — "logical"
    because a model without a logical head falls back to duplicating the
    (possibly inconsistent, tau-gated) qubit correction, and a real
    logical-head realization is always consistent so the gate never costs
    it anything.  Returns (ex_hat, ez_hat, choice[B]).

    Two cost rules:

    * default — the Y-aware depolarizing weight |support(ex OR ez)|
      (X, Y, Z equiprobable single events, so a Y costs ONE unit);
    * ``nlp`` given — **posterior likelihood selection**: candidate cost =
      sum_q -log p_q(class of candidate at q) under the GNN's own
      per-qubit posterior (``nlp`` uint8 [B, n, 4] in 1/16-nat units,
      class = ex + 2 ez; see _nlp4).  This is approximate MAP over the
      candidate set under the TRAINED noise model rather than a uniform
      single-event prior — it fixes the circuit-level misranking where a
      lighter-but-wrong GNN correction beat the heavier-but-right matcher
      [round 4: d=5 circuit best-of lost to its own raw-MWPM candidate].

    ``qubit_inconsistent`` (bool [B]): precomputed consistency gate for
    the "qubit" candidate (s_res nonzero) — skips the parity matmuls the
    gate otherwise needs.  Matmuls run in f32 (BLAS; exact — sums are
    bounded by n << 2^24; numpy's integer matmul has no BLAS path and
    dominated serving throughput).
    """
    bsz = next(iter(cands.values()))[0].shape[0]
    weights = np.full((len(cand_names), bsz), np.inf)
    hz_f = hx_f = None
    for i, name in enumerate(cand_names):
        cex, cez = cands[name]
        if nlp is not None:
            cls = (cex + 2 * cez).astype(np.int64)  # [B, n] in {0..3}
            w = np.take_along_axis(
                nlp.astype(np.float32), cls[:, :, None], axis=2
            )[:, :, 0].sum(axis=1).astype(np.float64) / NLP_SCALE
        else:
            w = (cex | cez).sum(axis=1).astype(np.float64)
        if name in ("qubit", "logical"):
            if name == "qubit" and qubit_inconsistent is not None:
                sm = qubit_inconsistent
            else:
                if hz_f is None:
                    hz_f = hz.astype(np.float32).T
                    hx_f = hx.astype(np.float32).T
                s_hat = (cex.astype(np.float32) @ hz_f
                         + cez.astype(np.float32) @ hx_f) % 2
                sm = (s_hat != syn[:, : hz.shape[0]]).any(axis=1)
            w = np.where(sm, np.inf, w)
        weights[i] = w
    choice = np.argmin(weights, axis=0)
    ex_hat = np.take_along_axis(
        np.stack([cands[c][0] for c in cand_names]),
        choice[None, :, None], axis=0)[0]
    ez_hat = np.take_along_axis(
        np.stack([cands[c][1] for c in cand_names]),
        choice[None, :, None], axis=0)[0]
    return ex_hat, ez_hat, choice


@lru_cache(maxsize=64)
def _sample_fwd_fn(apply_fn: Callable, tau: float | None, batch: int):
    """Jitted sample+forward+residual chunk, cached across calls so an LER
    sweep compiles once per decoder (graph and p are traced arguments)."""
    from tpugnn.sampling.noise import syndrome as syn_of

    @jax.jit
    def sample_fwd(params, graph, k, p_):
        b = sample_batch(k, graph, p_, batch)
        out = apply_fn(params, graph, b.syndrome)
        ex_g, ez_g = _gated_corrections(out.qubit_logits, tau)
        s_res = jnp.mod(b.syndrome + syn_of(graph, ex_g, ez_g), 2.0)
        return b.ex, b.ez, ex_g, ez_g, s_res

    return sample_fwd


@lru_cache(maxsize=64)
def _fwd_fn(apply_fn: Callable, tau: float | None):
    from tpugnn.sampling.noise import syndrome as syn_of

    @jax.jit
    def fwd(params, graph, syn):
        out = apply_fn(params, graph, syn)
        ex_g, ez_g = _gated_corrections(out.qubit_logits, tau)
        s_res = jnp.mod(syn + syn_of(graph, ex_g, ez_g), 2.0)
        # uint8 off-device: all 0/1 bits, 4x smaller transfer
        u8 = lambda x: x.astype(jnp.uint8)
        return u8(ex_g), u8(ez_g), u8(s_res)

    return fwd


def _gated_corrections(qubit_logits: jnp.ndarray, tau: float | None):
    """Hard (ex, ez) from logits, optionally zeroed below confidence tau."""
    ex, ez = decode_corrections(qubit_logits)
    if tau is None:
        return ex, ez
    if qubit_logits.shape[-1] == 4:
        prob = jax.nn.softmax(qubit_logits, axis=-1)
        conf = jnp.max(prob, axis=-1)
    else:
        # sigmoid bits: confidence = max(p, 1-p) of the chosen bit, jointly
        p = jax.nn.sigmoid(qubit_logits)
        conf = jnp.prod(jnp.maximum(p, 1.0 - p), axis=-1)
    keep = (conf >= tau).astype(jnp.float32)
    return ex * keep, ez * keep


def gnn_cleanup_corrections(
    apply_fn: Callable,
    params,
    graph: TannerGraph,
    syndrome_batch: jnp.ndarray,
    cleanup_decoder,
    *,
    tau: float | None = None,
):
    """Decode one batch: GNN correction + classical cleanup of the residual.

    ``cleanup_decoder.decode(syndrome [B, n_checks_pad]) -> (ex, ez)`` over
    the unpadded ``n_qubits`` (UnionFindDecoder / MWPMDecoder API).
    Returns host uint8 arrays (ex_hat, ez_hat) of shape [B, n_qubits].
    """
    n = graph.n_qubits
    ex_g, ez_g, s_res = _fwd_fn(apply_fn, tau)(params, graph, syndrome_batch)
    ex_u, ez_u = lazy_decode(cleanup_decoder, s_res)
    ex_hat = np.asarray(ex_g)[:, :n].astype(np.uint8) ^ ex_u
    ez_hat = np.asarray(ez_g)[:, :n].astype(np.uint8) ^ ez_u
    return ex_hat, ez_hat


def ler_gnn_cleanup(
    apply_fn: Callable,
    params,
    graph: TannerGraph,
    *,
    p: float,
    shots: int,
    batch: int = 4096,
    key: jax.Array | None = None,
    cleanup: str = "uf",
    tau: float | None = None,
    force_python: bool = False,
) -> dict[str, float]:
    """Monte-Carlo LER of the GNN + cleanup hybrid decoder."""
    if cleanup == "uf":
        from tpugnn.baselines.union_find import UnionFindDecoder

        dec = UnionFindDecoder(graph, force_python=force_python)
    elif cleanup == "mwpm":
        from tpugnn.baselines.mwpm import MWPMDecoder

        dec = MWPMDecoder(graph, p=p, force_python=force_python)
    else:
        raise ValueError(f"unknown cleanup decoder {cleanup!r}")

    key = key if key is not None else jax.random.PRNGKey(0)
    n = graph.n_qubits
    hx = np.asarray(graph.h_syn_ez)[: graph.n_checks, :n]
    hz = np.asarray(graph.h_syn_ex)[: graph.n_checks, :n]
    lx = np.asarray(graph.logicals_x)[:, :n]
    lz = np.asarray(graph.logicals_z)[:, :n]

    sample_fwd = _sample_fwd_fn(apply_fn, tau, batch)
    fails = 0
    syn_mismatch = 0
    total = 0
    for _ in range(max(1, (shots + batch - 1) // batch)):
        key, sub = jax.random.split(key)
        ex, ez, ex_g, ez_g, s_res = sample_fwd(params, graph, sub, p)
        ex_u, ez_u = lazy_decode(dec, s_res)
        ex_hat = np.asarray(ex_g)[:, :n].astype(np.uint8) ^ ex_u
        ez_hat = np.asarray(ez_g)[:, :n].astype(np.uint8) ^ ez_u
        rx = (np.asarray(ex)[:, :n].astype(np.uint8) ^ ex_hat) & 1
        rz = (np.asarray(ez)[:, :n].astype(np.uint8) ^ ez_hat) & 1
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
        "decoder": f"gnn+{cleanup}" + (f"@tau{tau}" if tau is not None else ""),
    }


@lru_cache(maxsize=64)
def _best_of_fwd_fn(apply_fn: Callable, tau: float | None, batch: int):
    """Jitted sample+forward chunk for ler_best_of, cached at module level
    so a p/tau sweep compiles once per (decoder, tau, batch) instead of
    once per call (multi-minute tunnel compiles otherwise)."""
    from tpugnn.sampling.noise import syndrome as syn_of

    @jax.jit
    def f(params, graph, k, p_):
        b = sample_batch(k, graph, p_, batch)
        out = apply_fn(params, graph, b.syndrome)
        ex_g, ez_g = _gated_corrections(out.qubit_logits, tau)
        s_res = jnp.mod(b.syndrome + syn_of(graph, ex_g, ez_g), 2.0)
        lex, lez = (logical_head_correction(graph, b.syndrome,
                                            out.logical_logits)
                    if out.logical_logits is not None
                    else (ex_g, ez_g))
        return b.ex, b.ez, b.syndrome, ex_g, ez_g, s_res, lex, lez

    return f


def _nlp4(qubit_logits, temperature: float = 1.0):
    """Per-qubit 4-class negative log-probs, uint8-quantized (1/16 nat).

    pauli4 head: -log_softmax over [I, X, Z, Y].  bits head (2 sigmoid
    logits): the two bits are modeled independent, so
    -log p(ex, ez) = -log p_x(ex) - log p_z(ez), expanded to the same
    class order I, X, Z, Y (class = ex + 2 ez).

    ``temperature`` > 1 softens an overconfident posterior before the
    cost is taken (standard temperature scaling; the round-5 calibration
    lever for the residual circuit-level selection margin).  Overridable
    globally via the TPUGNN_NLL_TEMP env var (read at trace time).
    """
    t = float(os.environ.get("TPUGNN_NLL_TEMP", temperature))
    if t != 1.0:
        qubit_logits = qubit_logits / t
    if qubit_logits.shape[-1] == 4:
        nlp = -jax.nn.log_softmax(qubit_logits, axis=-1)
    else:
        lx = qubit_logits[..., 0]
        lz = qubit_logits[..., 1]
        nx1 = -jax.nn.log_sigmoid(lx)
        nx0 = -jax.nn.log_sigmoid(-lx)
        nz1 = -jax.nn.log_sigmoid(lz)
        nz0 = -jax.nn.log_sigmoid(-lz)
        nlp = jnp.stack([nx0 + nz0, nx1 + nz0, nx0 + nz1, nx1 + nz1],
                        axis=-1)
    q = jnp.round(nlp * NLP_SCALE)
    return jnp.clip(q, 0.0, 255.0).astype(jnp.uint8)


@lru_cache(maxsize=64)
def _unified_fn(apply_fn: Callable, tau: float | None, batch: int,
                with_nlp: bool = False):
    """Jitted sample+forward chunk emitting everything every hybrid column
    needs, once: per-shot failure sums for the pure-GNN columns plus uint8
    corrections/residuals for the host-side classical decodes (uint8 cuts
    the device->host transfer 4x vs f32 — the host must sync per chunk
    anyway because the matchers consume these arrays)."""
    from tpugnn.eval.ler import count_failures
    from tpugnn.sampling.noise import syndrome as syn_of

    @jax.jit
    def f(params, graph, k, p_):
        b = sample_batch(k, graph, p_, batch)
        out = apply_fn(params, graph, b.syndrome)
        ex, ez = decode_corrections(out.qubit_logits)
        ex_g, ez_g = _gated_corrections(out.qubit_logits, tau)
        s_res = jnp.mod(b.syndrome + syn_of(graph, ex_g, ez_g), 2.0)
        # fallback realization of the "logical" candidate for models without
        # a logical head: the GATED qubit correction, matching ler_best_of
        # bit-for-bit for per_qubit readouts with tau set [ADVICE r2 item 2]
        lex, lez = (logical_head_correction(graph, b.syndrome,
                                            out.logical_logits)
                    if out.logical_logits is not None else (ex_g, ez_g))
        fails = count_failures(graph, b, ex, ez, out.logical_logits)
        sums = {k2: jnp.sum(v) for k2, v in fails.items()}
        u8 = lambda x: x.astype(jnp.uint8)
        nlp = _nlp4(out.qubit_logits) if with_nlp else None
        return (sums, u8(b.ex), u8(b.ez), u8(b.syndrome), u8(ex_g), u8(ez_g),
                u8(s_res), u8(lex), u8(lez), nlp)

    return f


def _columns_result(sums, counters, picked, cand_names, total, *,
                    best_of, with_mwpm, with_uf_raw, with_mwpm_raw) -> dict:
    """Assemble the ler_all_columns output dict from accumulated counters."""
    sums = {k2: float(v) for k2, v in sums.items()}
    ler = sums.get("fail_qubit", 0.0) / total
    out = {
        "ler": ler,
        "ler_stderr": (max(ler * (1 - ler), 1e-12) / total) ** 0.5,
        "shots": float(total),
        "gnn_uf": counters["gnn_uf"] / total,
        "gnn_mwpm": (counters["gnn_mwpm"] / total) if with_mwpm else None,
        "gnn_best_of": (counters["best_of"] / total) if best_of else None,
        "picked": ({c: int(picked[i]) for i, c in enumerate(cand_names)}
                   if best_of else None),
        "uf": (counters["uf"] / total) if with_uf_raw else None,
        "mwpm": (counters["mwpm"] / total) if with_mwpm_raw else None,
    }
    if "fail_logical" in sums:
        out["ler_logical"] = sums["fail_logical"] / total
        out["ler_hybrid"] = sums["fail_hybrid"] / total
    return out


def ler_all_columns(
    apply_fn: Callable,
    params,
    graph: TannerGraph,
    *,
    p: float,
    shots: int,
    batch: int = 4096,
    key: jax.Array | None = None,
    tau: float | None = None,
    best_of: bool = True,
    with_mwpm: bool = True,
    with_uf_raw: bool = False,
    with_mwpm_raw: bool | None = None,
    force_python: bool = False,
    progress_path: str | None = None,
    flush_every: int = 25,
    on_progress: Callable[[dict], None] | None = None,
    select_cost: str = "weight",
) -> dict:
    """Every GNN-side LER column from ONE Monte-Carlo pass.

    ``select_cost='nll'`` ranks the best-of candidates by the GNN's own
    posterior likelihood instead of support weight (see
    min_weight_select) — approximate MAP over the candidate set.

    The LER table used to run four independent 1M-shot passes per point
    (plain MC, GNN+UF, GNN+MWPM, best-of), each re-sampling, re-running the
    GNN forward and re-decoding residuals.  This evaluator samples once per
    chunk and shares the forward and the classical decodes across columns;
    the chunk key schedule matches the legacy evaluators (split per chunk
    from the same master key), so each column reproduces its legacy value
    bit-for-bit.

    Returns ler / ler_logical / ler_hybrid (+stderr), gnn_uf, gnn_mwpm,
    gnn_best_of (+picked), and optionally the raw union-find / MWPM
    baselines computed inline on the same shots (``with_uf_raw`` /
    ``with_mwpm_raw``; raw MWPM is on by default whenever ``best_of`` and
    ``with_mwpm`` are, since the best-of candidate set needs it anyway).

    **Resumable** [VERDICT r3 missing-3]: with ``progress_path`` set, the
    accumulated counters + the exact chunk RNG key are checkpointed to a
    JSON file every ``flush_every`` chunks (atomic rename), and a rerun
    with the same configuration resumes the key stream where it stopped —
    the completed result is bit-identical to an uninterrupted run, and a
    killed run loses at most ``flush_every`` chunks instead of everything
    (the r3a 100M-shot stage burned 2h for zero output).  ``on_progress``
    (called at each flush with the partial result dict) lets the caller
    land partial rows.
    """
    from tpugnn.baselines.union_find import UnionFindDecoder

    uf = UnionFindDecoder(graph, force_python=force_python)
    mw = None
    if with_mwpm:
        from tpugnn.baselines.mwpm import MWPMDecoder

        mw = MWPMDecoder(graph, p=p, force_python=force_python)
    if with_mwpm_raw is None:
        with_mwpm_raw = best_of and with_mwpm
    # the raw-MWPM decode lives under the with_mwpm branch: without it the
    # counter would stay 0 and report a spuriously perfect baseline
    # [ADVICE r2 item 1]
    with_mwpm_raw = with_mwpm_raw and with_mwpm

    key = key if key is not None else jax.random.PRNGKey(0)
    n = graph.n_qubits
    hx = np.asarray(graph.h_syn_ez)[: graph.n_checks, :n].astype(np.uint8)
    hz = np.asarray(graph.h_syn_ex)[: graph.n_checks, :n].astype(np.uint8)
    lx = np.asarray(graph.logicals_x)[:, :n].astype(np.uint8)
    lz = np.asarray(graph.logicals_z)[:, :n].astype(np.uint8)

    # f32 BLAS parity matmuls (exact: sums bounded by n << 2^24; numpy's
    # integer matmul has no BLAS path and dominated the MC wall time)
    hzT, hxT = hz.astype(np.float32).T, hx.astype(np.float32).T
    lzT, lxT = lz.astype(np.float32).T, lx.astype(np.float32).T

    def fail_of(cex, cez, ex, ez):
        rx = ((ex[:, :n] ^ cex) & 1).astype(np.float32)
        rz = ((ez[:, :n] ^ cez) & 1).astype(np.float32)
        sm = ((rx @ hzT) % 2).any(axis=1) | ((rz @ hxT) % 2).any(axis=1)
        lf = ((rx @ lzT) % 2).any(axis=1) | ((rz @ lxT) % 2).any(axis=1)
        return sm | lf

    if select_cost not in ("weight", "nll"):
        raise ValueError(f"unknown select_cost {select_cost!r}; "
                         "have 'weight'|'nll'")
    fwd = _unified_fn(apply_fn, tau, batch, with_nlp=select_cost == "nll")
    sums: dict = {}
    counters = {"gnn_uf": 0, "gnn_mwpm": 0, "best_of": 0, "uf": 0, "mwpm": 0}
    cand_names = ["qubit", "logical", "gnn_uf"]
    if with_mwpm:
        cand_names += ["gnn_mwpm", "mwpm"] if with_mwpm_raw else ["gnn_mwpm"]
    picked = np.zeros(len(cand_names), np.int64)
    total = 0

    # resume accumulated counters + the exact chunk key from a prior
    # interrupted run of the SAME configuration (batch/p/tau/columns)
    fingerprint = {"batch": batch, "p": p, "tau": tau,
                   "cand_names": list(cand_names), "best_of": best_of,
                   "with_uf_raw": with_uf_raw, "with_mwpm_raw": with_mwpm_raw,
                   "select_cost": select_cost}
    if progress_path and os.path.exists(progress_path):
        try:
            with open(progress_path) as f:
                st = json.load(f)
            if st.get("fingerprint") == fingerprint and st.get("total", 0) > 0:
                total = int(st["total"])
                counters = {k2: int(v) for k2, v in st["counters"].items()}
                sums = {k2: float(v) for k2, v in st["sums"].items()}
                picked = np.asarray(st["picked"], np.int64)
                key = jnp.asarray(st["key"], jnp.uint32)
        except (ValueError, KeyError, OSError):
            pass  # corrupt/foreign progress file: start clean

    def _flush():
        if not progress_path:
            return
        st = {"fingerprint": fingerprint, "total": total,
              "counters": counters,
              "sums": {k2: float(v) for k2, v in sums.items()},
              "picked": [int(x) for x in picked],
              "key": [int(x) for x in np.asarray(key)]}
        tmp = progress_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(st, f)
        os.replace(tmp, progress_path)
        if on_progress is not None:
            on_progress(_columns_result(
                sums, counters, picked, cand_names, total, best_of=best_of,
                with_mwpm=with_mwpm, with_uf_raw=with_uf_raw,
                with_mwpm_raw=with_mwpm_raw))

    chunk_i = 0
    while total < max(shots, 1):
        key, sub = jax.random.split(key)
        (s, ex, ez, syn, ex_g, ez_g, s_res, lex, lez,
         nlp_d) = fwd(params, graph, sub, p)
        for k2, v in s.items():
            sums[k2] = sums[k2] + v if k2 in sums else v
        ex, ez = np.asarray(ex), np.asarray(ez)
        syn = np.asarray(syn)
        exg = np.asarray(ex_g)[:, :n]
        ezg = np.asarray(ez_g)[:, :n]
        s_res = np.asarray(s_res)
        lex, lez = np.asarray(lex)[:, :n], np.asarray(lez)[:, :n]
        bsz = exg.shape[0]

        exu, ezu = lazy_decode(uf, s_res)
        cands = {"qubit": (exg, ezg),
                 "logical": (lex, lez),
                 "gnn_uf": (exg ^ exu, ezg ^ ezu)}
        if with_mwpm:
            exm, ezm = lazy_decode(mw, s_res)
            cands["gnn_mwpm"] = (exg ^ exm, ezg ^ ezm)
            if with_mwpm_raw:
                exmr, ezmr = lazy_decode(mw, syn)
                cands["mwpm"] = (exmr, ezmr)
                counters["mwpm"] += int(fail_of(*cands["mwpm"], ex, ez).sum())
        if with_uf_raw:
            exur, ezur = lazy_decode(uf, syn)
            counters["uf"] += int(fail_of(exur, ezur, ex, ez).sum())
        counters["gnn_uf"] += int(fail_of(*cands["gnn_uf"], ex, ez).sum())
        if with_mwpm:
            counters["gnn_mwpm"] += int(fail_of(*cands["gnn_mwpm"], ex, ez).sum())

        if best_of:
            nlp_np = (np.asarray(nlp_d)[:, :n] if nlp_d is not None
                      else None)
            ex_hat, ez_hat, choice = min_weight_select(
                cand_names, cands, syn, hz, hx,
                qubit_inconsistent=s_res.any(axis=1), nlp=nlp_np)
            for i in range(len(cand_names)):
                picked[i] += int((choice == i).sum())
            counters["best_of"] += int(fail_of(ex_hat, ez_hat, ex, ez).sum())
        total += bsz
        chunk_i += 1
        if progress_path and chunk_i % max(1, flush_every) == 0:
            _flush()

    out = _columns_result(sums, counters, picked, cand_names, total,
                          best_of=best_of, with_mwpm=with_mwpm,
                          with_uf_raw=with_uf_raw, with_mwpm_raw=with_mwpm_raw)
    if progress_path:
        # the completed result lands in the caller's rows cache; a stale
        # progress file must not resume INTO a different future request
        with contextlib.suppress(OSError):
            os.remove(progress_path)
        with contextlib.suppress(OSError):
            os.remove(progress_path + ".tmp")
    return out


def logical_head_correction(graph: TannerGraph, syndrome_batch, logical_logits):
    """Realize the logical-class head's prediction as a physical correction.

    e_hat = (pure error T @ s) XOR the predicted logical representatives:
    bx selects lx_i, bz selects lz_i (the symplectic pairing used by
    sampling.logical_class_bits, so <lz_i, ex_hat XOR ex0> = bx_i).
    Syndrome-consistent by construction.
    """
    s = syndrome_batch
    b = (logical_logits > 0.0).astype(jnp.float32)
    k = graph.k
    bx, bz = b[..., :k], b[..., k:]
    ex0 = jnp.mod(s @ graph.pure_ex.T, 2.0)
    ez0 = jnp.mod(s @ graph.pure_ez.T, 2.0)
    ex = jnp.mod(ex0 + bx @ graph.logicals_x, 2.0)
    ez = jnp.mod(ez0 + bz @ graph.logicals_z, 2.0)
    return ex, ez


def ler_best_of(
    apply_fn: Callable,
    params,
    graph: TannerGraph,
    *,
    p: float,
    shots: int,
    batch: int = 4096,
    key: jax.Array | None = None,
    candidates: tuple = ("qubit", "logical", "gnn_uf", "gnn_mwpm", "mwpm"),
    tau: float | None = None,
    force_python: bool = False,
) -> dict[str, float]:
    """Per-shot minimum-weight selection over syndrome-consistent candidates.

    Every candidate correction is syndrome-consistent (the raw per-qubit
    head is assigned infinite weight when it is not); the decoder commits
    the lightest under the Y-aware depolarizing weight |support(ex OR ez)|
    (X, Y, Z are equiprobable single events, so a Y costs ONE unit — the
    weighting MWPM's independent-sector decomposition cannot express).
    Approximate MAP over the candidate set; never much worse than the best
    member, often better than every one.
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    n = graph.n_qubits
    hx = np.asarray(graph.h_syn_ez)[: graph.n_checks, :n]
    hz = np.asarray(graph.h_syn_ex)[: graph.n_checks, :n]
    lx = np.asarray(graph.logicals_x)[:, :n]
    lz = np.asarray(graph.logicals_z)[:, :n]

    need_uf = "gnn_uf" in candidates
    need_mw = "gnn_mwpm" in candidates or "mwpm" in candidates
    uf = mw = None
    if need_uf:
        from tpugnn.baselines.union_find import UnionFindDecoder

        uf = UnionFindDecoder(graph, force_python=force_python)
    if need_mw:
        from tpugnn.baselines.mwpm import MWPMDecoder

        mw = MWPMDecoder(graph, p=p, force_python=force_python)

    fwd = _best_of_fwd_fn(apply_fn, tau, batch)
    hzb = hz.astype(np.uint8)
    hxb = hx.astype(np.uint8)
    fails = 0
    total = 0
    picked = np.zeros(len(candidates), np.int64)
    for _ in range(max(1, (shots + batch - 1) // batch)):
        key, sub = jax.random.split(key)
        ex, ez, s, ex_g, ez_g, s_res, lex, lez = fwd(params, graph, sub, p)
        s_np = np.asarray(s).astype(np.uint8)
        s_res_np = np.asarray(s_res)
        exg = np.asarray(ex_g)[:, :n].astype(np.uint8)
        ezg = np.asarray(ez_g)[:, :n].astype(np.uint8)
        cands = {}
        for name in candidates:
            if name == "qubit":
                cands[name] = (exg, ezg)
            elif name == "logical":
                cands[name] = (np.asarray(lex)[:, :n].astype(np.uint8),
                               np.asarray(lez)[:, :n].astype(np.uint8))
            elif name == "gnn_uf":
                exu, ezu = lazy_decode(uf, s_res_np)
                cands[name] = (exg ^ exu, ezg ^ ezu)
            elif name == "gnn_mwpm":
                exm, ezm = lazy_decode(mw, s_res_np)
                cands[name] = (exg ^ exm, ezg ^ ezm)
            elif name == "mwpm":
                exm, ezm = lazy_decode(mw, s_np)
                cands[name] = (exm, ezm)
            else:
                raise ValueError(f"unknown candidate {name!r}")
        bsz = exg.shape[0]
        ex_hat, ez_hat, choice = min_weight_select(
            candidates, cands, s_np, hzb, hxb,
            qubit_inconsistent=s_res_np.any(axis=1))
        for i in range(len(candidates)):
            picked[i] += int((choice == i).sum())
        rx = ((np.asarray(ex)[:, :n].astype(np.uint8) ^ ex_hat) & 1
              ).astype(np.float32)
        rz = ((np.asarray(ez)[:, :n].astype(np.uint8) ^ ez_hat) & 1
              ).astype(np.float32)
        lf = ((rx @ lz.T) % 2).any(axis=1) | ((rz @ lx.T) % 2).any(axis=1)
        sm = (((rx @ hz.T) % 2).any(axis=1) | ((rz @ hx.T) % 2).any(axis=1))
        fails += int(np.sum(lf | sm))
        total += bsz
    ler = fails / total
    return {
        "ler": ler,
        "ler_stderr": (max(ler * (1 - ler), 1e-12) / total) ** 0.5,
        "shots": float(total),
        "decoder": "best_of:" + "+".join(candidates),
        "picked": {c: int(picked[i]) for i, c in enumerate(candidates)},
    }

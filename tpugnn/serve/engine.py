"""Serving engine: low-latency batched decode for deployment.

Bundles (graph, params, compiled decode fn) behind a numpy-in/numpy-out API:

    eng = DecodeEngine.from_checkpoint("runs/surface_d11", cfg)
    corrections = eng.decode(syndromes)          # np.uint8 [B, m] -> [B, n, 2]

Design points for production decoding:

* the decode function is jitted once at construction and **warmed up** on
  the configured batch size, so first-request latency is compile-free;
* requests are padded to the compiled batch size (static shapes — one
  compiled program, any request size <= max_batch);
* the round loop runs the fused Pallas kernel when ``use_pallas`` (default
  on TPU), the XLA 'fused' backend otherwise;
* microbatching: requests larger than ``max_batch`` are chunked.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpugnn.configs.config import ExperimentConfig
from tpugnn.eval.ler import decode_corrections
from tpugnn.models.decoder import GNNDecoder
from tpugnn.tanner import build_code
from tpugnn.tanner.graph import TannerGraph

__all__ = ["DecodeEngine"]


class DecodeEngine:
    def __init__(
        self,
        cfg: ExperimentConfig,
        params,
        graph: Optional[TannerGraph] = None,
        *,
        max_batch: int = 4096,
        use_pallas: Optional[bool] = None,
        data_parallel: Optional[int] = None,
        cleanup: Optional[str] = None,
        cleanup_tau: Optional[float] = None,
        lazy: bool = False,
        wire_pack: bool = True,
        pp_workers: int = 2,
        select_cost: str = "weight",
    ):
        # lazy best-of serving [VERDICT r2 task 4]: the residual-syndrome
        # cleanup decodes always skip zero-residual shots (exact — no
        # defects means the zero correction).  With ``lazy=True`` the raw
        # MWPM candidate is additionally computed only for shots whose
        # gated GNN correction is syndrome-INconsistent; consistent shots
        # substitute the GNN correction for that candidate.  This is a
        # documented approximation: a full raw-MWPM decode could occasionally
        # be lighter than an already-consistent GNN correction and win the
        # min-weight selection.  tests/test_serve.py measures the exact/lazy
        # agreement; the tau-sweep picked histograms show the matcher path
        # is needed on a small minority of shots.
        self._lazy = bool(lazy)
        if select_cost not in ("weight", "nll"):
            raise ValueError(f"unknown select_cost {select_cost!r}; "
                             "have 'weight'|'nll'")
        if select_cost == "nll" and cleanup != "best_of":
            raise ValueError("select_cost='nll' requires cleanup='best_of'")
        # posterior-likelihood best-of ranking (eval/hybrid.min_weight_select
        # nlp path): ships the per-qubit 4-class neg-log-probs as a uint8
        # side tensor — costs extra D2H, buys the approximate-MAP selection
        # that closed 60% of the circuit-level MWPM gap (round 4)
        self._nll = select_cost == "nll"
        self.cfg = cfg
        self.graph = graph if graph is not None else build_code(
            cfg.code.family, cfg.code.distance,
            pad_nodes=cfg.code.pad_nodes, pad_edges=cfg.code.pad_edges,
        )
        self.params = params
        self.max_batch = max_batch
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        mcfg = cfg.model
        # the Pallas fast path consumes the 'fused'-backend parameter layout;
        # narrow message widths are zero-padded to the 128 lane dim inside
        # the kernel (fused_decoder.pad_msg_width, bit-exact; H=96 hardware
        # probe runs/probe_narrow_h96.json validates the lowering)
        if use_pallas and mcfg.weight_tied and mcfg.aggr == "sum" and \
                mcfg.backend == "fused":
            from tpugnn.models.pallas_decoder import PallasDecoder

            apply_fn = PallasDecoder(mcfg, k=self.graph.k).apply
        else:
            apply_fn = GNNDecoder(mcfg, k=self.graph.k).apply
        graph_ = self.graph

        # optional GNN + classical-cleanup hybrid serving (the deployed
        # form of tpugnn.eval.hybrid): the jitted program also emits the
        # residual syndrome; union-find/MWPM repairs it host-side and the
        # combined correction is syndrome-consistent by construction
        self._cleanup_dec = None
        self._best_of = cleanup == "best_of"
        if self._best_of:
            # strongest deployed rule: per-shot minimum-weight MAP over
            # {gated qubit head, realized logical head, GNN+UF, GNN+MWPM,
            # raw MWPM} — never commits a heavier correction than MWPM's
            from tpugnn.baselines.mwpm import MWPMDecoder
            from tpugnn.baselines.union_find import UnionFindDecoder

            self._uf = UnionFindDecoder(self.graph)
            self._mw = MWPMDecoder(self.graph, p=cfg.code.p)
            n = self.graph.n_qubits
            self._hx = np.asarray(self.graph.h_syn_ez)[
                : self.graph.n_checks, :n].astype(np.uint8)
            self._hz = np.asarray(self.graph.h_syn_ex)[
                : self.graph.n_checks, :n].astype(np.uint8)
        elif cleanup is not None:
            if cleanup == "uf":
                from tpugnn.baselines.union_find import UnionFindDecoder

                self._cleanup_dec = UnionFindDecoder(self.graph)
            elif cleanup == "mwpm":
                from tpugnn.baselines.mwpm import MWPMDecoder

                self._cleanup_dec = MWPMDecoder(self.graph, p=cfg.code.p)
            else:
                raise ValueError(f"unknown cleanup decoder {cleanup!r}")

        # outputs leave the device as uint8: every emitted value is a 0/1
        # bit, and the cast cuts the device->host transfer 4x (the same
        # lesson ler_all_columns applied to the eval path — on a
        # tunnel-attached chip the f32 transfer dominated serving
        # throughput, runs/decoder_throughput_r3.json)
        u8 = lambda x: x.astype(jnp.uint8)
        if cleanup is None:
            def _decode(params, syndrome):
                out = apply_fn(params, graph_, syndrome)
                ex, ez = decode_corrections(out.qubit_logits)
                return u8(jnp.stack([ex, ez], axis=-1))
        elif self._best_of:
            from tpugnn.eval.hybrid import (
                _gated_corrections,
                _nlp4,
                logical_head_correction,
            )
            from tpugnn.sampling.noise import syndrome as _syn_of

            want_nll = self._nll

            def _decode(params, syndrome):
                out = apply_fn(params, graph_, syndrome)
                ex, ez = _gated_corrections(out.qubit_logits, cleanup_tau)
                s_res = jnp.mod(syndrome + _syn_of(graph_, ex, ez), 2.0)
                lex, lez = (logical_head_correction(
                    graph_, syndrome, out.logical_logits)
                    if out.logical_logits is not None else (ex, ez))
                s2 = jnp.stack([s_res, jnp.zeros_like(s_res)], axis=-1)
                bits = u8(jnp.concatenate(
                    [jnp.stack([ex, ez], axis=-1), s2,
                     jnp.stack([lex, lez], axis=-1)], axis=1
                ))  # [B, n_pad + m_pad + n_pad, 2]
                if want_nll:
                    return bits, _nlp4(out.qubit_logits)
                return bits
        else:
            from tpugnn.eval.hybrid import _gated_corrections
            from tpugnn.sampling.noise import syndrome as _syn_of

            def _decode(params, syndrome):
                out = apply_fn(params, graph_, syndrome)
                ex, ez = _gated_corrections(out.qubit_logits, cleanup_tau)
                s_res = jnp.mod(syndrome + _syn_of(graph_, ex, ez), 2.0)
                s2 = jnp.stack([s_res, jnp.zeros_like(s_res)], axis=-1)
                return u8(jnp.concatenate(
                    [jnp.stack([ex, ez], axis=-1), s2], axis=1
                ))  # [B, n_pad + m_pad, 2]

        # bitpacked wire format (default on; lossless — every transferred
        # value is a 0/1 bit): syndromes upload as packed bits (32x less
        # H2D than f32) and unpack to f32 on device; outputs pack on
        # device and unpack host-side with np.unpackbits (8x less D2H
        # than uint8).  On a tunnel/relay-attached chip the transfers are
        # a first-order serving cost (PERF_NOTES round 3/4).
        n_pad_s, m_pad_s = self.graph.n_qubits_pad, self.graph.n_checks_pad
        self._out_rows = n_pad_s + (
            (m_pad_s + n_pad_s) if self._best_of
            else m_pad_s if self._cleanup_dec is not None else 0)
        self._wire_pack = bool(wire_pack)
        if self._wire_pack:
            _decode_inner = _decode

            def _decode(params, syn_packed):
                syn = jnp.unpackbits(syn_packed, axis=1,
                                     count=m_pad_s).astype(jnp.float32)
                out = _decode_inner(params, syn)
                if isinstance(out, tuple):  # (bits, nlp): pack bits only
                    return jnp.packbits(out[0], axis=1), out[1]
                return jnp.packbits(out, axis=1)

        if data_parallel and data_parallel > 1:
            # data-parallel serving: the request batch shards over a 1-D
            # 'data' mesh (GSPMD partitions the per-sample decode with no
            # collectives on the forward path); params/graph replicate
            import numpy as _np
            from jax.sharding import Mesh, NamedSharding
            from jax.sharding import PartitionSpec as P

            devs = jax.devices()
            if len(devs) < data_parallel:
                raise ValueError(
                    f"data_parallel={data_parallel} but only {len(devs)} devices")
            if max_batch % data_parallel:
                raise ValueError("max_batch must divide by data_parallel")
            mesh = Mesh(_np.asarray(devs[:data_parallel]), ("data",))
            rep = NamedSharding(mesh, P())
            shard = NamedSharding(mesh, P("data"))
            self._decode = jax.jit(
                _decode,
                in_shardings=(rep, shard),
                out_shardings=shard,
            )
        else:
            self._decode = jax.jit(_decode)
        # warm up: compile at the serving batch size
        dummy = (jnp.zeros((max_batch, m_pad_s // 8), jnp.uint8)
                 if self._wire_pack
                 else jnp.zeros((max_batch, m_pad_s), jnp.float32))
        from tpugnn.utils.timing import hard_sync

        hard_sync(self._decode(self.params, dummy))

        # host post-processing pool: chunk syncs + classical cleanup run on
        # worker threads (numpy BLAS and the ctypes C++ decoders release
        # the GIL), so the dispatch thread keeps the device fed.  Each
        # worker builds its OWN cleanup decoder instances (the C++ batch
        # decoders carry scratch buffers and are not thread-safe).
        import threading
        from concurrent.futures import ThreadPoolExecutor

        self._pp_workers = max(1, int(pp_workers))
        self._pool = ThreadPoolExecutor(max_workers=self._pp_workers)
        self._tl = threading.local()

    @classmethod
    def from_checkpoint(
        cls, checkpoint_dir: str, cfg: ExperimentConfig, **kw
    ) -> "DecodeEngine":
        from tpugnn.train.checkpoint import CheckpointManager
        from tpugnn.train.loop import init_state

        graph = build_code(cfg.code.family, cfg.code.distance,
                           pad_nodes=cfg.code.pad_nodes,
                           pad_edges=cfg.code.pad_edges)
        state, _ = init_state(cfg, graph)
        mgr = CheckpointManager(checkpoint_dir)
        restored = mgr.restore_latest(state)
        if restored is None:
            raise FileNotFoundError(f"no checkpoint in {checkpoint_dir}")
        return cls(cfg, restored.params, graph, **kw)

    # chunks allowed in flight on the device at once: enough to keep the
    # device busy while the host post-processes the synced chunk, bounded
    # so HBM residency is O(window), not O(request) — a multi-million-shot
    # decode() used to hold EVERY chunk's in/out buffers until the final
    # sync and could OOM the 16G chip [ADVICE r3 medium]
    inflight_window: int = 3

    def decode(self, syndromes: np.ndarray) -> np.ndarray:
        """np [B, m] or [B, m_pad] in {0,1} -> np.uint8 [B, n_qubits, 2].

        Software-pipelined: chunk i's host work (transfer + classical
        cleanup / best-of selection) runs while the device computes chunks
        i+1..i+window — the ~25 ms/batch host-side matcher cost that used
        to serialize after ALL device work now overlaps it
        [VERDICT r3 missing-6 / next-7].
        """
        s = np.asarray(syndromes, np.float32)
        b, m = s.shape
        m_pad = self.graph.n_checks_pad
        if m < m_pad:
            s = np.pad(s, ((0, 0), (0, m_pad - m)))
        elif m > m_pad:
            raise ValueError(f"syndrome width {m} exceeds graph checks {m_pad}")
        los = list(range(0, b, self.max_batch))
        outs: list = [None] * len(los)
        futs: dict = {}
        for i, lo in enumerate(los):
            chunk = s[lo : lo + self.max_batch]
            nb = chunk.shape[0]
            if nb < self.max_batch:
                chunk = np.pad(chunk, ((0, self.max_batch - nb), (0, 0)))
            wire = (np.packbits(chunk.astype(np.uint8), axis=1)
                    if self._wire_pack else chunk)
            dev = self._decode(self.params, jnp.asarray(wire))
            futs[i] = self._pool.submit(self._finish_chunk, dev, nb,
                                        s[lo : lo + nb])
            del dev
            if i >= self.inflight_window:
                j = i - self.inflight_window
                outs[j] = futs.pop(j).result()
        for j in sorted(futs):
            outs[j] = futs[j].result()
        return outs[0] if len(outs) == 1 else np.concatenate(outs, axis=0)

    def _finish_chunk(self, dev, nb: int, s_chunk: np.ndarray) -> np.ndarray:
        """Worker-thread tail: sync the device buffer, unpack, post-process."""
        nlp = None
        if isinstance(dev, tuple):
            dev, nlp_dev = dev
            nlp = np.asarray(nlp_dev)[:nb]
            del nlp_dev
        full = np.asarray(dev)[:nb]
        del dev  # drop the device buffer ref immediately
        if self._wire_pack:
            full = np.unpackbits(full, axis=1, count=self._out_rows)
        return self._postprocess(full.astype(np.uint8), s_chunk, nlp=nlp)

    def _tl_decoders(self):
        """Per-thread cleanup decoder instances (C++ decoders carry scratch
        state; each pool worker gets its own)."""
        tl = self._tl
        if not getattr(tl, "ready", False):
            if self._best_of:
                from tpugnn.baselines.mwpm import MWPMDecoder
                from tpugnn.baselines.union_find import UnionFindDecoder

                tl.uf = UnionFindDecoder(self.graph)
                tl.mw = MWPMDecoder(self.graph, p=self.cfg.code.p)
            elif self._cleanup_dec is not None:
                tl.cleanup = type(self._cleanup_dec)(self.graph) \
                    if not hasattr(self._cleanup_dec, "p") else \
                    type(self._cleanup_dec)(self.graph, p=self.cfg.code.p)
            tl.ready = True
        return tl

    def _postprocess(self, full: np.ndarray, s_chunk: np.ndarray,
                     nlp: np.ndarray | None = None) -> np.ndarray:
        """Host-side tail for one synced chunk: [nb, ...] uint8 -> [nb, n, 2]."""
        n_pad = self.graph.n_qubits_pad
        m_pad = self.graph.n_checks_pad
        n = self.graph.n_qubits
        if self._best_of:
            from tpugnn.eval.hybrid import lazy_decode, min_weight_select

            tl = self._tl_decoders()
            exg = full[:, :n, 0]
            ezg = full[:, :n, 1]
            s_res = full[:, n_pad : n_pad + m_pad, 0]
            lex = full[:, n_pad + m_pad : n_pad + m_pad + n, 0]
            lez = full[:, n_pad + m_pad : n_pad + m_pad + n, 1]
            exu, ezu = lazy_decode(tl.uf, s_res)
            exm, ezm = lazy_decode(tl.mw, s_res)
            if self._lazy:
                # matcher only where the GNN correction is inconsistent;
                # consistent shots reuse the GNN correction as the 'mwpm'
                # candidate (see __init__ docstring for the approximation)
                nz = np.flatnonzero(s_res.any(axis=1))
                exr, ezr = exg.copy(), ezg.copy()
                if nz.size:
                    er, zr = tl.mw.decode(s_chunk[nz])
                    exr[nz], ezr[nz] = er.astype(np.uint8), zr.astype(np.uint8)
            else:
                er, zr = tl.mw.decode(s_chunk)
                exr, ezr = er.astype(np.uint8), zr.astype(np.uint8)
            cands = {
                "qubit": (exg, ezg),
                "logical": (lex, lez),
                "gnn_uf": (exg ^ exu, ezg ^ ezu),
                "gnn_mwpm": (exg ^ exm, ezg ^ ezm),
                "mwpm": (exr, ezr),
            }
            ex_hat, ez_hat, _ = min_weight_select(
                tuple(cands), cands, s_chunk.astype(np.uint8),
                self._hz, self._hx,
                qubit_inconsistent=s_res.any(axis=1),
                nlp=None if nlp is None else nlp[:, :n])
            return np.stack([ex_hat, ez_hat], axis=-1).astype(np.uint8)
        if self._cleanup_dec is None:
            return full[:, :n, :]
        from tpugnn.eval.hybrid import lazy_decode

        corr = full[:, :n_pad, :]
        s_res = full[:, n_pad : n_pad + m_pad, 0]
        ex_u, ez_u = lazy_decode(self._tl_decoders().cleanup, s_res)
        corr = corr[:, :n, :].copy()
        corr[:, :, 0] ^= ex_u
        corr[:, :, 1] ^= ez_u
        return corr

"""Deterministic edge partitioner for graph-parallel message passing.

Partition scheme (SURVEY.md §2.4 dist/partition.py):

* Check rows and qubit rows are split into ``n_parts`` contiguous blocks of
  the *global padded layout* (block p owns checks [p*mb, (p+1)*mb) and qubits
  [p*nb, (p+1)*nb)), so shard-local node features are plain slices of the
  global arrays and reassembling outputs is concatenation — no permutation.
* Every edge is assigned **twice, once per aggregation direction**, to the
  shard that owns the edge's *destination* row: the check-direction list of
  shard p holds every edge whose check lies in p's block (sorted by check,
  CSR-style), the qubit-direction list likewise by qubit.  Aggregation is
  therefore always a purely local segmented sum; only *source node features*
  cross shards (halo exchange, tpugnn.dist.exchange).
* Per-shard lists are padded to the max shard size (static shapes across the
  mesh); padded edges carry zero mask and point at the local dump row.

Partitioner invariants (each edge assigned exactly once per direction, local
aggregation == global aggregation) are asserted in tests/dist/.

The reference has no distributed story at all — single process, single GPU
[SURVEY.md §2.3]; this subsystem is new capability mandated by
BASELINE.json's north star (multi-host edge-partitioned d>=15 decoding).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

from tpugnn.tanner.graph import TannerGraph, build_tanner_graph

__all__ = ["PartitionedGraph", "LocalGraphView", "partition_graph", "build_partitioned_code"]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@struct.dataclass
class LocalGraphView:
    """One shard's view of the partitioned Tanner graph (inside shard_map).

    Exposes the same attribute surface the decoder model and the mp engine
    touch on TannerGraph (n_checks_pad, check_mask, check_is_x, ...), so the
    *same* flax module body runs unchanged per shard; mp dispatches on this
    type to run halo-exchange message passing (tpugnn.dist.exchange).
    """

    # statics
    name: str = struct.field(pytree_node=False)
    mesh_axis: str = struct.field(pytree_node=False)     # mesh axis name ('graph')
    n_checks_pad: int = struct.field(pytree_node=False)  # = mb (local rows)
    n_qubits_pad: int = struct.field(pytree_node=False)  # = nb
    n_checks: int = struct.field(pytree_node=False)      # GLOBAL real counts
    n_qubits: int = struct.field(pytree_node=False)      # (pool normalization)
    k: int = struct.field(pytree_node=False)

    # leaves (shard-local)
    c_dst: jnp.ndarray       # i32[Ec] local check index
    c_src: jnp.ndarray       # i32[Ec] GLOBAL qubit index
    c_mask: jnp.ndarray      # f32[Ec]
    q_dst: jnp.ndarray       # i32[Eq] local qubit index
    q_src: jnp.ndarray       # i32[Eq] GLOBAL check index
    q_mask: jnp.ndarray      # f32[Eq]
    check_mask: jnp.ndarray  # f32[mb]
    qubit_mask: jnp.ndarray  # f32[nb]
    check_is_x: jnp.ndarray  # f32[mb]
    check_deg: jnp.ndarray   # f32[mb]
    qubit_deg: jnp.ndarray   # f32[nb]
    check_feat: jnp.ndarray  # f32[mb, POS_F]
    qubit_feat: jnp.ndarray  # f32[nb, POS_F]

    # --- boundary-only all_to_all halo tables (halo='alltoall') ----------
    # check-direction: interior edges (src qubit local) / boundary edges
    # (src indexes the [P*Hq] halo recv buffer); qsend_* are the qubit rows
    # this shard sends to each peer.
    halo: str = struct.field(pytree_node=False, default="gather")
    # wire format for halo payloads [VERDICT r3 missing-4 / next-6]:
    # 'float32' (bit-exact, the parity-test default), 'bfloat16' (2x less
    # ICI traffic), or 'int8' (4x; symmetric per-(shot, peer-slice) dynamic
    # scale shipped alongside — see dist/exchange._quant_pack)
    halo_dtype: str = struct.field(pytree_node=False, default="float32")
    hq: int = struct.field(pytree_node=False, default=0)  # qubit halo width
    hc: int = struct.field(pytree_node=False, default=0)  # check halo width
    ci_dst: jnp.ndarray | None = None   # i32[Eci]
    ci_src: jnp.ndarray | None = None   # i32[Eci] LOCAL qubit index
    ci_mask: jnp.ndarray | None = None
    cb_dst: jnp.ndarray | None = None   # i32[Ecb]
    cb_src: jnp.ndarray | None = None   # i32[Ecb] halo-buffer index
    cb_mask: jnp.ndarray | None = None
    qsend_idx: jnp.ndarray | None = None   # i32[P, Hq] local qubit rows to send
    qsend_mask: jnp.ndarray | None = None  # f32[P, Hq]
    # qubit-direction twins
    qi_dst: jnp.ndarray | None = None
    qi_src: jnp.ndarray | None = None   # LOCAL check index
    qi_mask: jnp.ndarray | None = None
    qb_dst: jnp.ndarray | None = None
    qb_src: jnp.ndarray | None = None
    qb_mask: jnp.ndarray | None = None
    csend_idx: jnp.ndarray | None = None
    csend_mask: jnp.ndarray | None = None

    # canonical edge ids per local edge slot (indexes the GLOBAL padded edge
    # axis) — lets the sharded path gather per-edge attributes locally, since
    # edge attribute tables are small static graph data replicated everywhere
    c_eid: jnp.ndarray | None = None   # i32[Ec]
    q_eid: jnp.ndarray | None = None   # i32[Eq]
    ci_eid: jnp.ndarray | None = None
    cb_eid: jnp.ndarray | None = None
    qi_eid: jnp.ndarray | None = None
    qb_eid: jnp.ndarray | None = None


@struct.dataclass
class PartitionedGraph:
    """Stacked per-shard graph data; leading axis = shard = mesh 'graph' axis."""

    # statics
    name: str = struct.field(pytree_node=False)
    n_parts: int = struct.field(pytree_node=False)
    mesh_axis: str = struct.field(pytree_node=False)
    mb: int = struct.field(pytree_node=False)            # local check rows
    nb: int = struct.field(pytree_node=False)            # local qubit rows
    ec_pad: int = struct.field(pytree_node=False)
    eq_pad: int = struct.field(pytree_node=False)
    n_checks: int = struct.field(pytree_node=False)
    n_qubits: int = struct.field(pytree_node=False)
    k: int = struct.field(pytree_node=False)

    # leaves, shape [P, ...]
    c_dst: jnp.ndarray
    c_src: jnp.ndarray
    c_mask: jnp.ndarray
    q_dst: jnp.ndarray
    q_src: jnp.ndarray
    q_mask: jnp.ndarray
    check_mask: jnp.ndarray
    qubit_mask: jnp.ndarray
    check_is_x: jnp.ndarray
    check_deg: jnp.ndarray
    qubit_deg: jnp.ndarray
    check_feat: jnp.ndarray
    qubit_feat: jnp.ndarray

    # boundary-only all_to_all halo tables (see LocalGraphView)
    halo: str = struct.field(pytree_node=False, default="gather")
    halo_dtype: str = struct.field(pytree_node=False, default="float32")
    hq: int = struct.field(pytree_node=False, default=0)
    hc: int = struct.field(pytree_node=False, default=0)
    ci_dst: jnp.ndarray | None = None
    ci_src: jnp.ndarray | None = None
    ci_mask: jnp.ndarray | None = None
    cb_dst: jnp.ndarray | None = None
    cb_src: jnp.ndarray | None = None
    cb_mask: jnp.ndarray | None = None
    qsend_idx: jnp.ndarray | None = None
    qsend_mask: jnp.ndarray | None = None
    qi_dst: jnp.ndarray | None = None
    qi_src: jnp.ndarray | None = None
    qi_mask: jnp.ndarray | None = None
    qb_dst: jnp.ndarray | None = None
    qb_src: jnp.ndarray | None = None
    qb_mask: jnp.ndarray | None = None
    csend_idx: jnp.ndarray | None = None
    csend_mask: jnp.ndarray | None = None

    # canonical edge ids (see LocalGraphView)
    c_eid: jnp.ndarray | None = None
    q_eid: jnp.ndarray | None = None
    ci_eid: jnp.ndarray | None = None
    cb_eid: jnp.ndarray | None = None
    qi_eid: jnp.ndarray | None = None
    qb_eid: jnp.ndarray | None = None

    def local(self) -> LocalGraphView:
        """Squeeze the shard axis (call inside shard_map, where P-slice = 1)."""
        sq = lambda a: None if a is None else a[0]
        return LocalGraphView(
            name=self.name, mesh_axis=self.mesh_axis,
            n_checks_pad=self.mb, n_qubits_pad=self.nb,
            n_checks=self.n_checks, n_qubits=self.n_qubits, k=self.k,
            c_dst=sq(self.c_dst), c_src=sq(self.c_src), c_mask=sq(self.c_mask),
            q_dst=sq(self.q_dst), q_src=sq(self.q_src), q_mask=sq(self.q_mask),
            check_mask=sq(self.check_mask), qubit_mask=sq(self.qubit_mask),
            check_is_x=sq(self.check_is_x),
            check_deg=sq(self.check_deg), qubit_deg=sq(self.qubit_deg),
            check_feat=sq(self.check_feat), qubit_feat=sq(self.qubit_feat),
            halo=self.halo, halo_dtype=self.halo_dtype,
            hq=self.hq, hc=self.hc,
            ci_dst=sq(self.ci_dst), ci_src=sq(self.ci_src), ci_mask=sq(self.ci_mask),
            cb_dst=sq(self.cb_dst), cb_src=sq(self.cb_src), cb_mask=sq(self.cb_mask),
            qsend_idx=sq(self.qsend_idx), qsend_mask=sq(self.qsend_mask),
            qi_dst=sq(self.qi_dst), qi_src=sq(self.qi_src), qi_mask=sq(self.qi_mask),
            qb_dst=sq(self.qb_dst), qb_src=sq(self.qb_src), qb_mask=sq(self.qb_mask),
            csend_idx=sq(self.csend_idx), csend_mask=sq(self.csend_mask),
            c_eid=sq(self.c_eid), q_eid=sq(self.q_eid),
            ci_eid=sq(self.ci_eid), cb_eid=sq(self.cb_eid),
            qi_eid=sq(self.qi_eid), qb_eid=sq(self.qb_eid),
        )


def _halo_tables(dst, src, n_parts, dst_block, src_block, pad=8):
    """Interior/boundary edge split + per-peer send tables for one direction.

    Edges are owned by the destination's shard; an edge is *interior* when
    its source row is also local, *boundary* otherwise.  Boundary sources
    are deduplicated per (receiver, sender) pair and assigned halo slots;
    the receiver's halo buffer is laid out [P_senders, H] (flattened), so a
    boundary edge's source index is ``sender * H + slot``.
    """
    P = n_parts
    interior = [[] for _ in range(P)]
    boundary = [[] for _ in range(P)]   # (dst_local, sender, src_global, eid)
    needed: dict[tuple[int, int], list[int]] = {}
    for e, (d, s) in enumerate(zip(dst.tolist(), src.tolist())):
        p, o = d // dst_block, s // src_block
        if o == p:
            interior[p].append((d - p * dst_block, s - p * src_block, e))
        else:
            boundary[p].append((d - p * dst_block, o, s, e))
            lst = needed.setdefault((p, o), [])
            if s not in lst:
                lst.append(s)
    h = _round_up(max((len(v) for v in needed.values()), default=1), pad)
    slot = {
        (p, o): {s: k for k, s in enumerate(sorted(v))}
        for (p, o), v in needed.items()
    }
    send_idx = np.zeros((P, P, h), np.int32)
    send_mask = np.zeros((P, P, h), np.float32)
    for (p, o), v in needed.items():
        for s, k in slot[(p, o)].items():
            send_idx[o, p, k] = s - o * src_block
            send_mask[o, p, k] = 1.0
    ei = _round_up(max((len(x) for x in interior), default=1) or 1, pad)
    eb = _round_up(max((len(x) for x in boundary), default=1) or 1, pad)
    i_dst = np.full((P, ei), dst_block - 1, np.int32)
    i_src = np.full((P, ei), src_block - 1, np.int32)
    i_mask = np.zeros((P, ei), np.float32)
    i_eid = np.zeros((P, ei), np.int32)
    b_dst = np.full((P, eb), dst_block - 1, np.int32)
    b_src = np.zeros((P, eb), np.int32)
    b_mask = np.zeros((P, eb), np.float32)
    b_eid = np.zeros((P, eb), np.int32)
    for p in range(P):
        for j, (dl, sl, e) in enumerate(interior[p]):
            i_dst[p, j], i_src[p, j], i_mask[p, j], i_eid[p, j] = dl, sl, 1.0, e
        for j, (dl, o, s, e) in enumerate(boundary[p]):
            b_dst[p, j] = dl
            b_src[p, j] = o * h + slot[(p, o)][s]
            b_mask[p, j] = 1.0
            b_eid[p, j] = e
    return (
        jnp.asarray(i_dst), jnp.asarray(i_src), jnp.asarray(i_mask),
        jnp.asarray(b_dst), jnp.asarray(b_src), jnp.asarray(b_mask),
        jnp.asarray(send_idx), jnp.asarray(send_mask), h,
        jnp.asarray(i_eid), jnp.asarray(b_eid),
    )


def partition_graph(
    graph: TannerGraph, n_parts: int, *, mesh_axis: str = "graph",
    pad_edges: int = 128, halo: str = "alltoall",
    halo_dtype: str = "float32",
) -> PartitionedGraph:
    """Partition a built TannerGraph into ``n_parts`` contiguous node blocks.

    Requires the padded node counts to divide evenly (use
    :func:`build_partitioned_code` to construct a graph padded for a given
    shard count).
    """
    m_pad, n_pad = graph.n_checks_pad, graph.n_qubits_pad
    if m_pad % n_parts or n_pad % n_parts:
        raise ValueError(
            f"padded node counts ({m_pad}, {n_pad}) must divide n_parts={n_parts}; "
            "build the graph with pad_nodes a multiple of 8*n_parts"
        )
    mb, nb = m_pad // n_parts, n_pad // n_parts

    ec = np.asarray(graph.edge_check)[: graph.n_edges]
    eq = np.asarray(graph.edge_qubit)[: graph.n_edges]

    def lists(dst, src, block):
        owners = dst // block
        per = [np.lexsort((src[owners == p], dst[owners == p])) for p in range(n_parts)]
        counts = [int((owners == p).sum()) for p in range(n_parts)]
        epad = _round_up(max(max(counts), 1), pad_edges)
        d = np.full((n_parts, epad), block - 1, np.int32)
        s = np.zeros((n_parts, epad), np.int32)
        msk = np.zeros((n_parts, epad), np.float32)
        eid = np.zeros((n_parts, epad), np.int32)
        for p in range(n_parts):
            sel = np.where(owners == p)[0][per[p]]
            c = counts[p]
            d[p, :c] = dst[sel] - p * block
            s[p, :c] = src[sel]
            msk[p, :c] = 1.0
            eid[p, :c] = sel
        return d, s, msk, epad, counts, eid

    c_dst, c_src, c_mask, ec_pad, c_counts, c_eid = lists(ec, eq, mb)
    q_dst, q_src, q_mask, eq_pad, q_counts, q_eid = lists(eq, ec, nb)
    assert sum(c_counts) == graph.n_edges and sum(q_counts) == graph.n_edges

    def blocks(x, block):
        return np.asarray(x).reshape(n_parts, block)

    halo_fields: dict = {"halo": halo, "halo_dtype": halo_dtype,
                         "c_eid": jnp.asarray(c_eid),
                         "q_eid": jnp.asarray(q_eid)}
    if halo in ("alltoall", "ring"):  # ring reuses the per-peer send tables
        (ci_d, ci_s, ci_m, cb_d, cb_s, cb_m, qs_i, qs_m, hq,
         ci_e, cb_e) = _halo_tables(ec, eq, n_parts, mb, nb)
        (qi_d, qi_s, qi_m, qb_d, qb_s, qb_m, cs_i, cs_m, hc,
         qi_e, qb_e) = _halo_tables(eq, ec, n_parts, nb, mb)
        halo_fields.update(
            hq=hq, hc=hc,
            ci_dst=ci_d, ci_src=ci_s, ci_mask=ci_m, ci_eid=ci_e,
            cb_dst=cb_d, cb_src=cb_s, cb_mask=cb_m, cb_eid=cb_e,
            qsend_idx=qs_i, qsend_mask=qs_m,
            qi_dst=qi_d, qi_src=qi_s, qi_mask=qi_m, qi_eid=qi_e,
            qb_dst=qb_d, qb_src=qb_s, qb_mask=qb_m, qb_eid=qb_e,
            csend_idx=cs_i, csend_mask=cs_m,
        )
    elif halo != "gather":
        raise ValueError(
            f"unknown halo mode {halo!r}; have 'gather'|'alltoall'|'ring'")

    return PartitionedGraph(
        name=graph.name + f"_p{n_parts}", n_parts=n_parts, mesh_axis=mesh_axis,
        mb=mb, nb=nb, ec_pad=ec_pad, eq_pad=eq_pad,
        n_checks=graph.n_checks, n_qubits=graph.n_qubits, k=graph.k,
        c_dst=jnp.asarray(c_dst), c_src=jnp.asarray(c_src), c_mask=jnp.asarray(c_mask),
        q_dst=jnp.asarray(q_dst), q_src=jnp.asarray(q_src), q_mask=jnp.asarray(q_mask),
        check_mask=jnp.asarray(blocks(graph.check_mask, mb)),
        qubit_mask=jnp.asarray(blocks(graph.qubit_mask, nb)),
        check_is_x=jnp.asarray(blocks(graph.check_is_x, mb)),
        check_deg=jnp.asarray(blocks(graph.check_deg, mb)),
        qubit_deg=jnp.asarray(blocks(graph.qubit_deg, nb)),
        check_feat=jnp.asarray(np.asarray(graph.check_feat).reshape(n_parts, mb, -1)),
        qubit_feat=jnp.asarray(np.asarray(graph.qubit_feat).reshape(n_parts, nb, -1)),
        **halo_fields,
    )


def build_partitioned_code(
    family: str, distance: int, n_parts: int, **kw
) -> tuple[TannerGraph, PartitionedGraph]:
    """Build a code with padding compatible with an ``n_parts`` graph axis."""
    from tpugnn.tanner import build_code

    pad = kw.pop("pad_nodes", 8)
    pad = _round_up(pad * n_parts, 8)
    halo = kw.pop("halo", "alltoall")
    halo_dtype = kw.pop("halo_dtype", "float32")
    graph = build_code(family, distance, pad_nodes=pad, **kw)
    return graph, partition_graph(graph, n_parts, halo=halo,
                                  halo_dtype=halo_dtype)

"""TannerGraph: the static, padded, device-resident graph structure.

Every code family (surface / toric / repetition) reduces to a CSS pair
``(Hx, Hz)`` of parity-check matrices; :func:`build_tanner_graph` turns that
pair into a single bipartite Tanner graph over

    check nodes   = X-type stabilizers ++ Z-type stabilizers   (m = mx + mz)
    qubit nodes   = data qubits                                 (n)
    edges         = stabilizer support incidences               (E)

laid out for TPU execution:

* **Static padded shapes** — every array is padded (checks/qubits to
  ``pad_nodes`` multiples, edges to ``pad_edges`` multiples) so a given
  ``(d, batch, rounds)`` config compiles exactly once.  Padded entries are
  masked, and masking invariance is asserted by tests
  (tests/test_mp.py::test_masking_invariance).
* **Sorted COO + CSR row pointers in both directions** — edges are stored
  once in canonical order (sorted by check, then qubit); ``qubit_perm``
  re-orders them by qubit.  Segmented reductions over contiguous rows replace
  the reference's atomic ``scatter_add`` (torch_scatter CUDA) so aggregation
  is deterministic and maps onto TPU-friendly row-block kernels
  [SURVEY.md §2.2 N1, §7 "Hard parts" #1].
* **Dense incidence operators** — the graphs are small (d=11 surface code:
  241 nodes, 480 edges) while batch is large (B=4096), so gather/scatter can
  also be expressed as one-hot matmuls that run on the MXU; ``h_inc`` /
  ``gather_*`` matrices support that execution path (see tpugnn.mp).
* **Logical operators + pure-error tables on device** — Monte-Carlo
  logical-error-rate evaluation runs fully on-device (tpugnn.eval), so the
  graph carries ``logicals_x/z`` and the pure-error right-inverses.

Reference provenance: the upstream repo builds ``edge_index`` int64[2, E]
host-side with numpy/torch and feeds PyG-style ``MessagePassing``
[SURVEY.md §3.4, reconstruction; the reference mount was empty — SURVEY.md §0].
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

from tpugnn.utils import f2

__all__ = ["TannerGraph", "build_tanner_graph", "POS_F"]

POS_F = 8  # width of the static random node-identity features


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@struct.dataclass
class TannerGraph:
    """Padded, device-resident Tanner graph for one CSS code instance.

    Shape-defining metadata is static (hashable aux data, part of the jit
    cache key); arrays are pytree leaves living on device.
    """

    # --- static metadata -------------------------------------------------
    name: str = struct.field(pytree_node=False)
    n_checks: int = struct.field(pytree_node=False)     # real check count (mx+mz)
    n_qubits: int = struct.field(pytree_node=False)     # real data-qubit count
    n_edges: int = struct.field(pytree_node=False)      # real edge count
    n_checks_x: int = struct.field(pytree_node=False)   # X-type checks (first rows)
    n_checks_pad: int = struct.field(pytree_node=False)
    n_qubits_pad: int = struct.field(pytree_node=False)
    n_edges_pad: int = struct.field(pytree_node=False)
    k: int = struct.field(pytree_node=False)            # number of logical qubits
    deg_max_check: int = struct.field(pytree_node=False)  # max check degree (ELL width)
    deg_max_qubit: int = struct.field(pytree_node=False)  # max qubit degree (ELL width)

    # --- COO (canonical order: sorted by (check, qubit)) -----------------
    edge_check: jnp.ndarray   # i32[E_pad]; padded edges -> n_checks_pad - 1
    edge_qubit: jnp.ndarray   # i32[E_pad]; padded edges -> n_qubits_pad - 1
    edge_mask: jnp.ndarray    # f32[E_pad]; 1.0 real, 0.0 padding

    # --- CSR over checks (canonical order is already check-sorted) -------
    check_rowptr: jnp.ndarray  # i32[m_pad + 1]
    check_deg: jnp.ndarray     # f32[m_pad]

    # --- CSR over qubits (via permutation into canonical order) ----------
    qubit_perm: jnp.ndarray    # i32[E_pad]; canonical id of i-th qubit-sorted edge
    qubit_rowptr: jnp.ndarray  # i32[n_pad + 1]
    qubit_deg: jnp.ndarray     # f32[n_pad]

    # --- ELL (uniform-degree) slot tables --------------------------------
    # QEC Tanner graphs have tiny bounded degree (<= 4 for surface/toric),
    # so padding every row to deg_max turns scatter-aggregation into a dense
    # masked reshape-sum over [rows, deg_max] slots — no scatter at all, the
    # TPU-native replacement for torch_scatter [SURVEY.md §7 hard-part #1].
    ell_check_edge: jnp.ndarray  # i32[m_pad, Dc]; canonical edge id (sentinel: E_pad-1)
    ell_check_mask: jnp.ndarray  # f32[m_pad, Dc]
    ell_qubit_edge: jnp.ndarray  # i32[n_pad, Dq]
    ell_qubit_mask: jnp.ndarray  # f32[n_pad, Dq]

    # --- node masks (1.0 real, 0.0 padding) ------------------------------
    check_mask: jnp.ndarray    # f32[m_pad]
    qubit_mask: jnp.ndarray    # f32[n_pad]

    # --- static node identity features -----------------------------------
    # deterministic random +-1 features per node (seeded from the node
    # index): message passing alone cannot distinguish automorphic nodes,
    # and the decoder needs positional identity to map syndromes to
    # corrections; random identifiers are the standard symmetry-breaking
    # device and shard naturally with the graph blocks
    check_feat: jnp.ndarray    # f32[m_pad, POS_F]
    qubit_feat: jnp.ndarray    # f32[n_pad, POS_F]

    # --- dense operators (MXU path + syndrome map) -----------------------
    h_syn_ez: jnp.ndarray      # f32[m_pad, n_pad]; X-type rows: s = Hx @ ez
    h_syn_ex: jnp.ndarray      # f32[m_pad, n_pad]; Z-type rows: s = Hz @ ex
    check_is_x: jnp.ndarray    # f32[m_pad]; 1.0 for X-type stabilizer rows

    # --- logical structure (for LER eval + class labels) ------------------
    logicals_x: jnp.ndarray    # f32[k, n_pad]; X-type logical operators
    logicals_z: jnp.ndarray    # f32[k, n_pad]
    pure_ex: jnp.ndarray       # f32[n_pad, m_pad]; ex0 = pure_ex @ s reproduces Z-check rows
    pure_ez: jnp.ndarray       # f32[n_pad, m_pad]; ez0 = pure_ez @ s reproduces X-check rows

    # --- optional per-qubit noise-rate scaling ----------------------------
    # None: depolarizing sampling at uniform rate p.  Array f32[n_pad]:
    # single-sector bit-flip sampling at rate p * rate_scale[q] (used by
    # spacetime/phenomenological graphs where "qubits" are fault locations
    # with distinct data/measurement rates).
    rate_scale: jnp.ndarray | None = None

    # ---------------------------------------------------------------------
    @property
    def h_inc(self) -> jnp.ndarray:
        """f32[m_pad, n_pad] 0/1 incidence (message-passing topology)."""
        return self.h_syn_ez + self.h_syn_ex

    def edges_per_sample(self) -> int:
        return self.n_edges


def build_tanner_graph(
    hx: np.ndarray,
    hz: np.ndarray,
    *,
    name: str,
    pad_nodes: int = 8,
    pad_edges: int = 128,
    logicals: tuple[np.ndarray, np.ndarray] | None = None,
    rate_scale: np.ndarray | None = None,
) -> TannerGraph:
    """Build the padded device graph from a CSS parity-check pair.

    ``hx``: [mx, n] X-stabilizer supports (detect Z errors).
    ``hz``: [mz, n] Z-stabilizer supports (detect X errors).
    Checks are laid out X-type first, then Z-type.

    ``logicals=(lx, lz)`` overrides the derived logical operators — used by
    spacetime (detector) graphs, whose *physical* failure classes are the
    base code's logicals lifted over fault locations rather than the
    detector matrix's own (mostly gauge) kernel.  ``rate_scale`` attaches
    per-qubit noise-rate multipliers (see TannerGraph.rate_scale).
    """
    hx = np.asarray(hx, dtype=np.uint8).reshape(-1, hx.shape[-1]) if hx.size else np.zeros((0, hz.shape[-1]), np.uint8)
    hz = np.asarray(hz, dtype=np.uint8).reshape(-1, hz.shape[-1]) if hz.size else np.zeros((0, hx.shape[-1]), np.uint8)
    mx, n = hx.shape
    mz = hz.shape[0]
    m = mx + mz
    h = np.vstack([hx, hz])  # [m, n] combined incidence

    if mx and mz:
        assert not ((hx @ hz.T) % 2).any(), f"{name}: Hx Hz^T != 0, not CSS"

    # logical operators + pure-error tables (host-side GF(2) algebra)
    if logicals is not None:
        lx, lz = (np.asarray(v, np.uint8) for v in logicals)
        assert lx.shape == lz.shape and lx.shape[1] == n
    else:
        lx, lz = f2.css_logicals(hx, hz)
    k = lx.shape[0]
    t_ez = f2.solve_right_inverse(hx)  # [n, mx]: ez0 = t_ez @ s_x
    t_ex = f2.solve_right_inverse(hz)  # [n, mz]: ex0 = t_ex @ s_z

    # --- canonical COO, sorted by (check, qubit) -------------------------
    cc, qq = np.nonzero(h)
    order = np.lexsort((qq, cc))
    cc, qq = cc[order].astype(np.int32), qq[order].astype(np.int32)
    e = cc.shape[0]

    # strictly grow padded dims so the last row/edge is always a dump slot
    m_pad = _round_up(m + 1, pad_nodes)
    n_pad = _round_up(n + 1, pad_nodes)
    e_pad = _round_up(e + 1, pad_edges)

    edge_check = np.full(e_pad, m_pad - 1, np.int32)
    edge_qubit = np.full(e_pad, n_pad - 1, np.int32)
    edge_mask = np.zeros(e_pad, np.float32)
    edge_check[:e], edge_qubit[:e], edge_mask[:e] = cc, qq, 1.0

    # CSR over checks: canonical order is check-sorted; padding edges all sit
    # in the dump row m_pad - 1.
    check_deg = np.bincount(edge_check, minlength=m_pad).astype(np.int64)
    check_rowptr = np.zeros(m_pad + 1, np.int32)
    check_rowptr[1:] = np.cumsum(check_deg).astype(np.int32)

    # CSR over qubits: permutation of canonical ids into (qubit, check) order.
    qorder = np.lexsort((edge_check, edge_qubit)).astype(np.int32)
    qubit_deg = np.bincount(edge_qubit, minlength=n_pad).astype(np.int64)
    qubit_rowptr = np.zeros(n_pad + 1, np.int32)
    qubit_rowptr[1:] = np.cumsum(qubit_deg).astype(np.int32)

    # ELL slot tables: canonical edge ids per destination row, padded to the
    # max degree; sentinel slots point at canonical edge e_pad-1 (always a
    # masked padding edge since e_pad > e).
    def ell(dst, rows):
        deg = np.bincount(dst, minlength=rows)
        dmax = max(int(deg[:rows].max(initial=0)), 1)
        tbl = np.full((rows, dmax), e_pad - 1, np.int32)
        msk = np.zeros((rows, dmax), np.float32)
        fill = np.zeros(rows, np.int64)
        for eid, r in enumerate(dst):
            tbl[r, fill[r]] = eid
            msk[r, fill[r]] = 1.0
            fill[r] += 1
        return tbl, msk, dmax

    ell_c_edge, ell_c_mask, dc = ell(cc, m_pad)
    ell_q_edge, ell_q_mask, dq = ell(qq, n_pad)

    # dense padded operators
    h_pad = np.zeros((m_pad, n_pad), np.float32)
    h_pad[:m, :n] = h
    is_x = np.zeros(m_pad, np.float32)
    is_x[:mx] = 1.0
    h_syn_ez = h_pad * is_x[:, None]   # X-type rows act on ez
    h_syn_ex = h_pad * (1.0 - is_x)[:, None]
    h_syn_ex[m:] = 0.0                 # padded rows are inert

    lx_pad = np.zeros((k, n_pad), np.float32)
    lz_pad = np.zeros((k, n_pad), np.float32)
    lx_pad[:, :n], lz_pad[:, :n] = lx, lz

    pure_ez = np.zeros((n_pad, m_pad), np.float32)
    pure_ex = np.zeros((n_pad, m_pad), np.float32)
    pure_ez[:n, :mx] = t_ez            # consumes X-check syndrome rows
    pure_ex[:n, mx:m] = t_ex           # consumes Z-check syndrome rows

    return TannerGraph(
        name=name,
        n_checks=m, n_qubits=n, n_edges=e, n_checks_x=mx,
        n_checks_pad=m_pad, n_qubits_pad=n_pad, n_edges_pad=e_pad, k=k,
        deg_max_check=dc, deg_max_qubit=dq,
        edge_check=jnp.asarray(edge_check),
        edge_qubit=jnp.asarray(edge_qubit),
        edge_mask=jnp.asarray(edge_mask),
        check_rowptr=jnp.asarray(check_rowptr),
        check_deg=jnp.asarray(np.maximum(check_deg, 1).astype(np.float32)),
        qubit_perm=jnp.asarray(qorder),
        qubit_rowptr=jnp.asarray(qubit_rowptr),
        qubit_deg=jnp.asarray(np.maximum(qubit_deg, 1).astype(np.float32)),
        ell_check_edge=jnp.asarray(ell_c_edge),
        ell_check_mask=jnp.asarray(ell_c_mask),
        ell_qubit_edge=jnp.asarray(ell_q_edge),
        ell_qubit_mask=jnp.asarray(ell_q_mask),
        check_mask=jnp.asarray((np.arange(m_pad) < m).astype(np.float32)),
        qubit_mask=jnp.asarray((np.arange(n_pad) < n).astype(np.float32)),
        check_feat=jnp.asarray(
            (np.random.default_rng(12345).integers(0, 2, (m_pad, POS_F)) * 2.0 - 1.0)
            * (np.arange(m_pad) < m)[:, None]
        ).astype(jnp.float32),
        qubit_feat=jnp.asarray(
            (np.random.default_rng(54321).integers(0, 2, (n_pad, POS_F)) * 2.0 - 1.0)
            * (np.arange(n_pad) < n)[:, None]
        ).astype(jnp.float32),
        h_syn_ez=jnp.asarray(h_syn_ez),
        h_syn_ex=jnp.asarray(h_syn_ex),
        check_is_x=jnp.asarray(is_x),
        logicals_x=jnp.asarray(lx_pad),
        logicals_z=jnp.asarray(lz_pad),
        pure_ex=jnp.asarray(pure_ex),
        pure_ez=jnp.asarray(pure_ez),
        rate_scale=(
            None
            if rate_scale is None
            else jnp.asarray(
                np.pad(np.asarray(rate_scale, np.float32), (0, n_pad - n))
            )
        ),
    )

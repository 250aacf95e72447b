"""Dense linear algebra over GF(2) (host-side, NumPy).

Used once per run at graph-construction time to derive logical operators,
pure-error (destabilizer) tables and rank checks for CSS codes.  Nothing here
runs on-device; all hot-path mod-2 arithmetic is done with f32 matmuls on TPU
(see ``tpugnn.sampling``).

Reference provenance: the upstream repo (ironmanaudi/GNN-decode) performs the
equivalent logical-operator bookkeeping with hard-coded operators per code
family [SURVEY.md §3.2, K-med]; we derive them generically so every code
family (surface/toric/repetition) shares one verified path.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "row_reduce",
    "rank",
    "nullspace",
    "in_rowspace",
    "solve_right_inverse",
    "css_logicals",
]


def _as_f2(a: np.ndarray) -> np.ndarray:
    a = np.asarray(a, dtype=np.uint8) % 2
    if a.ndim != 2:
        raise ValueError(f"expected 2-D matrix, got shape {a.shape}")
    return a


def _native():
    """The C++ packed-GF(2) library, or None (csrc/f2.cpp via ctypes)."""
    try:
        from tpugnn.utils.native import load

        return load()
    except Exception:
        return None


def row_reduce(a: np.ndarray) -> tuple[np.ndarray, list[int]]:
    """Row-reduce ``a`` over GF(2).

    Returns ``(R, pivots)`` where ``R`` is in reduced row-echelon form and
    ``pivots[i]`` is the pivot column of row ``i`` (rows beyond ``len(pivots)``
    are zero).  Dispatches to the packed-word C++ routine when built
    (64x fewer row-op instructions; matters for d >= 25 graph builds).
    """
    lib = _native()
    if lib is not None and a.size:
        r = np.ascontiguousarray(_as_f2(a).copy())
        pivots = np.zeros(min(r.shape), np.int32)
        rk = lib.f2_row_reduce(r, r.shape[0], r.shape[1], pivots)
        return r, pivots[:rk].tolist()
    return _row_reduce_py(a)


def _row_reduce_py(a: np.ndarray) -> tuple[np.ndarray, list[int]]:
    r = _as_f2(a).copy()
    m, n = r.shape
    pivots: list[int] = []
    row = 0
    for col in range(n):
        if row >= m:
            break
        sel = np.nonzero(r[row:, col])[0]
        if sel.size == 0:
            continue
        piv = row + int(sel[0])
        if piv != row:
            r[[row, piv]] = r[[piv, row]]
        # eliminate col everywhere else
        mask = r[:, col].astype(bool).copy()
        mask[row] = False
        r[mask] ^= r[row]
        pivots.append(col)
        row += 1
    return r, pivots


def rank(a: np.ndarray) -> int:
    lib = _native()
    if lib is not None and a.size:
        m = np.ascontiguousarray(_as_f2(a))
        return lib.f2_rank(m, m.shape[0], m.shape[1])
    _, pivots = _row_reduce_py(a)
    return len(pivots)


def nullspace(a: np.ndarray) -> np.ndarray:
    """Basis of the right nullspace of ``a`` over GF(2), shape [k, n]."""
    a = _as_f2(a)
    m, n = a.shape
    lib = _native()
    if lib is not None and a.size:
        am = np.ascontiguousarray(a)
        out = np.zeros((n, n), np.uint8)
        k = lib.f2_nullspace(am, m, n, out)
        basis = out[:k].copy()
        if basis.size:
            chk = (basis @ a.T) % 2
            assert not chk.any(), "native nullspace verification failed"
        return basis
    r, pivots = _row_reduce_py(a)
    free = [c for c in range(n) if c not in pivots]
    basis = np.zeros((len(free), n), dtype=np.uint8)
    for i, fc in enumerate(free):
        basis[i, fc] = 1
        # back-substitute: pivot row j has r[j, fc] coefficient on free col fc
        for j, pc in enumerate(pivots):
            basis[i, pc] = r[j, fc]
    if basis.size:
        chk = (basis @ a.T) % 2
        assert not chk.any(), "nullspace verification failed"
    return basis


def in_rowspace(v: np.ndarray, a: np.ndarray) -> bool:
    """True iff vector ``v`` lies in the rowspace of ``a`` over GF(2)."""
    a = _as_f2(a)
    v = np.asarray(v, dtype=np.uint8) % 2
    return rank(np.vstack([a, v[None, :]])) == rank(a)


def solve_right_inverse(h: np.ndarray) -> np.ndarray:
    """Matrix ``T`` with ``h @ T == I`` on the rowspace of ``h`` (mod 2).

    For a syndrome map ``s = h @ e``, ``e0 = T @ s`` is a *pure error*
    reproducing any achievable syndrome ``s``: ``h @ (T @ s) == s``.
    Returns ``T`` of shape [n, m] (n qubits, m checks).  Rows of ``h`` that
    are linearly dependent are consistent by CSS construction, so the pure
    error reproduces every sampled syndrome exactly.
    """
    h = _as_f2(h)
    m, n = h.shape
    t = np.zeros((n, m), dtype=np.uint8)
    if m == 0:
        return t
    # A unit syndrome on a *dependent* row (e.g. the redundant toric
    # stabilizer) is unachievable, so solve over an independent row subset J
    # only; dependent columns of T stay zero.  For any achievable s = h @ e,
    # h @ (T @ s) then matches s on J, and on dependent rows by linearity.
    indep: list[int] = []
    acc = np.zeros((0, n), np.uint8)
    for j in range(m):
        cand = np.vstack([acc, h[j][None, :]])
        if rank(cand) > len(indep):
            indep.append(j)
            acc = cand
    h_j = h[indep]
    for i, j in enumerate(indep):
        s = np.zeros(len(indep), dtype=np.uint8)
        s[i] = 1
        e = _solve(h_j, s)
        assert e is not None, "independent subsystem must be solvable"
        t[:, j] = e
    chk = (h @ t) % 2
    for i, j in enumerate(indep):
        assert chk[j, j] == 1, "right-inverse verification failed"
    return t


def _solve(a: np.ndarray, b: np.ndarray) -> np.ndarray | None:
    """One solution x of a @ x = b over GF(2), or None if inconsistent."""
    a = _as_f2(a)
    m, n = a.shape
    lib = _native()
    if lib is not None and a.size:
        am = np.ascontiguousarray(a)
        bv = np.ascontiguousarray(np.asarray(b, np.uint8).reshape(m) % 2)
        x = np.zeros(n, np.uint8)
        ok = lib.f2_solve(am, bv, m, n, x)
        return x if ok else None
    aug = np.hstack([a, np.asarray(b, dtype=np.uint8).reshape(m, 1)])
    r, pivots = row_reduce(aug)
    if n in pivots:  # pivot in the augmented column -> inconsistent
        return None
    x = np.zeros(n, dtype=np.uint8)
    for i, pc in enumerate(pivots):
        x[pc] = r[i, n]
    return x


def css_logicals(hx: np.ndarray, hz: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Paired logical operators of the CSS code (Hx, Hz).

    Returns ``(lx, lz)`` each of shape [k, n] with the canonical symplectic
    pairing ``lx[i] @ lz[j].T == delta_ij (mod 2)``.

    X-logicals: elements of ker(Hz) outside rowspace(Hx).
    Z-logicals: elements of ker(Hx) outside rowspace(Hz).
    """
    hx = _as_f2(hx) if hx.size else np.zeros((0, hz.shape[1]), np.uint8)
    hz = _as_f2(hz) if hz.size else np.zeros((0, hx.shape[1]), np.uint8)
    n = max(hx.shape[1], hz.shape[1])
    if hx.shape[0] and hz.shape[0]:
        assert not ((hx @ hz.T) % 2).any(), "Hx Hz^T != 0: not a CSS code"

    def coset_reps(kernel_basis: np.ndarray, stab_rows: np.ndarray) -> np.ndarray:
        """Independent representatives of ker / rowspace(stab)."""
        reps = []
        acc = stab_rows.copy() if stab_rows.size else np.zeros((0, n), np.uint8)
        base_rank = rank(acc) if acc.size else 0
        for v in kernel_basis:
            cand = np.vstack([acc, v[None, :]]) if acc.size else v[None, :]
            if rank(cand) > (base_rank + len(reps)):
                reps.append(v)
                acc = cand
        return np.array(reps, dtype=np.uint8).reshape(len(reps), n)

    lx = coset_reps(nullspace(hz) if hz.size else np.eye(n, dtype=np.uint8), hx)
    lz = coset_reps(nullspace(hx) if hx.size else np.eye(n, dtype=np.uint8), hz)
    k = min(len(lx), len(lz))
    lx, lz = lx[: len(lx)], lz[: len(lz)]

    # Canonicalize pairing: make P = lx @ lz^T the identity via row ops.
    p = (lx @ lz.T) % 2
    # Gaussian elimination on p acting on lx rows (and column ops on lz rows).
    lx = lx.copy()
    lz = lz.copy()
    for i in range(k):
        # find j >= i with p[i, j] == 1, swapping lz rows
        nz = np.nonzero(p[i, i:])[0]
        if nz.size == 0:
            # find a later lx row with a 1 in column >= i
            found = False
            for i2 in range(i + 1, len(lx)):
                if p[i2, i:].any():
                    lx[[i, i2]] = lx[[i2, i]]
                    p[[i, i2]] = p[[i2, i]]
                    found = True
                    break
            if not found:
                continue
            nz = np.nonzero(p[i, i:])[0]
        j = i + int(nz[0])
        if j != i:
            lz[[i, j]] = lz[[j, i]]
            p[:, [i, j]] = p[:, [j, i]]
        # clear other ones in row i (column ops -> add lz[i] to lz[j'])
        for j2 in range(len(lz)):
            if j2 != i and p[i, j2]:
                lz[j2] ^= lz[i]
                p[:, j2] ^= p[:, i]
        # clear other ones in column i (row ops -> add lx[i] to lx[i'])
        for i2 in range(len(lx)):
            if i2 != i and p[i2, i]:
                lx[i2] ^= lx[i]
                p[i2] ^= p[i]
    lx, lz = lx[:k], lz[:k]
    chk = (lx @ lz.T) % 2
    assert np.array_equal(chk, np.eye(k, dtype=np.uint8)), "pairing failed"
    return lx, lz

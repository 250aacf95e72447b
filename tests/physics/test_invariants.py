"""Physics invariants (SURVEY.md §4.3): toric translation symmetry, CSS
structure, logical-operator weight."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpugnn.sampling import syndrome
from tpugnn.tanner import build_code, toric_code_checks


def _translate_qubits(d: int, e: np.ndarray, dr: int, dc: int) -> np.ndarray:
    """Translate a toric-code qubit vector by (dr, dc) on the torus."""
    out = np.zeros_like(e)
    for r in range(d):
        for c in range(d):
            out[((r + dr) % d) * d + (c + dc) % d] = e[r * d + c]
            out[d * d + ((r + dr) % d) * d + (c + dc) % d] = e[d * d + r * d + c]
    return out


@pytest.mark.parametrize("dr,dc", [(1, 0), (0, 1), (2, 1)])
def test_toric_translation_equivariance(dr, dc):
    """Translating the error translates the syndrome identically."""
    d = 3
    g = build_code("toric", d)
    rng = np.random.default_rng(0)
    ex = rng.integers(0, 2, 2 * d * d).astype(np.float32)

    def syn(exv):
        full = jnp.zeros((1, g.n_qubits_pad)).at[0, : g.n_qubits].set(exv)
        return np.asarray(
            syndrome(g, full, jnp.zeros_like(full))
        )[0, : g.n_checks]

    s1 = syn(_translate_qubits(d, ex, dr, dc))
    # translate the syndrome of the original error: vertex checks at (r, c)
    # map to (r+dr, c+dc); same for plaquettes
    s0 = syn(ex)
    mx = g.n_checks_x
    s0t = np.zeros_like(s0)
    for r in range(d):
        for c in range(d):
            s0t[((r + dr) % d) * d + (c + dc) % d] = s0[r * d + c]
            s0t[mx + ((r + dr) % d) * d + (c + dc) % d] = s0[mx + r * d + c]
    np.testing.assert_array_equal(s1, s0t)


@pytest.mark.parametrize("family,d", [("surface", 3), ("surface", 5), ("toric", 3)])
def test_stabilizers_commute(family, d):
    """All stabilizers commute pairwise (symplectic products vanish)."""
    g = build_code(family, d)
    n = g.n_qubits
    hx = np.asarray(g.h_syn_ez)[: g.n_checks, :n]
    hz = np.asarray(g.h_syn_ex)[: g.n_checks, :n]
    assert not ((hx @ hz.T) % 2).any()


@pytest.mark.parametrize("d", [3, 5, 7])
def test_logical_weight_at_least_d(d):
    g = build_code("surface", d)
    lx = np.asarray(g.logicals_x)[:, : g.n_qubits]
    lz = np.asarray(g.logicals_z)[:, : g.n_qubits]
    assert lx.sum(1).min() >= d or lz.sum(1).min() >= d
    # and neither can be lighter than the code distance
    assert lx.sum(1).min() >= d
    assert lz.sum(1).min() >= d

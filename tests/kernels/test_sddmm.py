"""Pallas SDDMM kernel vs XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpugnn.kernels.fused_decoder import make_operators
from tpugnn.kernels.sddmm import sddmm_edge_hidden
from tpugnn.tanner import build_code


@pytest.mark.parametrize("family,d", [("surface", 3), ("toric", 3)])
def test_sddmm_matches_xla(family, d):
    g = build_code(family, d)
    g_c, mask_c, _, _, _, _ = make_operators(g)
    B, H, MH = 8, 32, 48
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    x_dst = jax.random.normal(k1, (B, g.n_checks_pad, H))
    x_src = jax.random.normal(k2, (B, g.n_qubits_pad, H))
    wd = jax.random.normal(k3, (H, MH)) * 0.1
    ws = jax.random.normal(k4, (H, MH)) * 0.1
    b = jnp.linspace(-0.1, 0.1, MH)

    got = sddmm_edge_hidden(x_dst, x_src, g_c, g.ell_check_mask, wd, ws, b,
                            compute_dtype="float32")

    # XLA reference: same algebra, batched layout
    yd = x_dst @ wd
    ys = x_src @ ws
    zs = jnp.einsum("es,bsf->bef", g_c, ys)
    dmax = g.deg_max_check
    zd = jnp.repeat(yd, dmax, axis=1)
    ref = jax.nn.relu(zs + zd + b) * g.ell_check_mask.reshape(1, -1, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4,
                               rtol=1e-3)

"""Compressed halo exchange [VERDICT r3 missing-4 / next-6].

The graph-axis all_to_all/ring halos can ship bf16 (2x less ICI traffic)
or int8 with a dynamic per-(shot, peer-slice) scale (4x less).  f32 stays
the default and is bit-exact (tests/dist/test_parity.py).  These tests pin
the compressed paths against the uncompressed sharded forward — close
logits, near-identical hard decisions — for both collectives.
"""

import jax
import numpy as np
import pytest

from tpugnn.configs.config import MeshConfig
from tpugnn.dist import build_partitioned_code, make_mesh, make_sharded_apply
from tpugnn.models import GNNDecoder
from tpugnn.sampling import sample_batch
from tpugnn.configs import ModelConfig


def _forward(halo, halo_dtype, d=5, P=4):
    graph, pg = build_partitioned_code("surface", d, P, halo=halo,
                                       halo_dtype=halo_dtype)
    mesh = make_mesh(MeshConfig(data=1, graph=P), n_devices=P)
    cfg = ModelConfig(hidden=16, msg_hidden=16, rounds=3)
    model = GNNDecoder(cfg, k=graph.k)
    b = sample_batch(jax.random.PRNGKey(0), graph, 0.08, 8)
    params = model.init(jax.random.PRNGKey(1), graph, b.syndrome)
    out = jax.jit(make_sharded_apply(model, mesh, pg))(
        params, graph, b.syndrome)
    return np.asarray(out.qubit_logits), np.asarray(out.logical_logits)


@pytest.mark.parametrize("halo", ["alltoall", "ring"])
@pytest.mark.parametrize("halo_dtype,tol", [("bfloat16", 0.05),
                                            ("int8", 0.08)])
def test_compressed_halo_close_to_f32(halo, halo_dtype, tol, devices8):
    ref_q, ref_l = _forward(halo, "float32")
    got_q, got_l = _forward(halo, halo_dtype)
    np.testing.assert_allclose(got_q, ref_q, atol=tol, rtol=tol)
    np.testing.assert_allclose(got_l, ref_l, atol=tol, rtol=tol)
    # hard decisions agree almost everywhere (quantization noise may flip
    # logits that sit at ~0)
    agree = (np.sign(got_q) == np.sign(ref_q)).mean()
    assert agree > 0.995, agree


def test_unknown_halo_dtype_raises(devices8):
    with pytest.raises(ValueError, match="halo_dtype"):
        _forward("alltoall", "float16")

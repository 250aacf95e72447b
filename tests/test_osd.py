"""BP+OSD-0: C++/numpy parity, syndrome consistency, LER vs plain BP."""

import jax
import numpy as np
import pytest

from tpugnn.baselines.osd import BPOSDDecoder, osd0_py
from tpugnn.eval.baseline import ler_bp, ler_bp_osd, ler_union_find
from tpugnn.sampling import sample_batch
from tpugnn.tanner import build_code
from tpugnn.utils import native


def _random_instance(rng, m, n, batch):
    h = (rng.random((m, n)) < 0.35).astype(np.uint8)
    h[0] |= 1  # avoid zero matrix
    e = (rng.random((batch, n)) < 0.15).astype(np.uint8)
    syn = (e @ h.T % 2).astype(np.uint8)
    llr = rng.standard_normal((batch, n)).astype(np.float32)
    return h, syn, llr


@pytest.mark.skipif(not native.available(), reason="no native lib")
def test_osd_native_matches_python():
    rng = np.random.default_rng(0)
    lib = native.load()
    for m, n in ((6, 10), (12, 25), (24, 49)):
        h, syn, llr = _random_instance(rng, m, n, 32)
        want = osd0_py(h, syn, llr)
        got = np.zeros_like(want)
        lib.osd0_decode_batch(h, m, n, syn, llr, syn.shape[0], got)
        np.testing.assert_array_equal(got, want)
        # both are syndrome-consistent solutions
        np.testing.assert_array_equal(got @ h.T % 2, syn)


@pytest.mark.parametrize("family,d", [("surface", 3), ("surface", 5), ("toric", 4)])
def test_bp_osd_always_syndrome_consistent(family, d):
    g = build_code(family, d)
    b = sample_batch(jax.random.PRNGKey(0), g, 0.08, 256)
    dec = BPOSDDecoder(g, p=0.08, iters=16)
    ex_hat, ez_hat = dec.decode(b.syndrome)
    n, m = g.n_qubits, g.n_checks
    hx = np.asarray(g.h_syn_ez)[:m, :n]
    hz = np.asarray(g.h_syn_ex)[:m, :n]
    syn = np.asarray(b.syndrome)[:, :m].astype(np.uint8)
    s_hat = (ez_hat @ hx.T + ex_hat @ hz.T) % 2
    np.testing.assert_array_equal(s_hat.astype(np.uint8), syn)


def test_bp_osd_beats_plain_bp():
    g = build_code("surface", 5)
    kw = dict(p=0.03, shots=2048, batch=1024, iters=24)
    bp = ler_bp(g, **kw)
    osd = ler_bp_osd(g, **kw)
    assert osd["syn_mismatch_rate"] == 0.0
    assert osd["ler"] < bp["ler"]


def test_bp_osd_subthreshold_scaling():
    kw = dict(p=0.01, shots=4096, batch=2048, iters=24)
    l3 = ler_bp_osd(build_code("surface", 3), **kw)["ler"]
    l5 = ler_bp_osd(build_code("surface", 5), **kw)["ler"]
    assert l5 <= l3 + 0.01, (l3, l5)

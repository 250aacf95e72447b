"""Spacetime (phenomenological) detector graphs: physics + pipeline tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpugnn.sampling import sample_batch, syndrome
from tpugnn.tanner import build_code
from tpugnn.tanner.spacetime import build_spacetime_code, spacetime_matrix
from tpugnn.tanner.surface import surface_code_checks


def test_detector_matrix_matches_physical_process():
    """H' @ faults == difference syndromes of the simulated noisy process."""
    d, d_t = 3, 4
    hx, hz = surface_code_checks(d)
    h = hz  # decode X faults via Z checks
    m, n = h.shape
    rng = np.random.default_rng(0)
    for _ in range(20):
        e = rng.integers(0, 2, (d_t, n)).astype(np.uint8)        # data faults/round
        mm = rng.integers(0, 2, (d_t, m)).astype(np.uint8)
        mm[-1] = 0                                               # final round perfect
        # physical: cumulative error, noisy measurement, difference syndromes
        s_hat = [(h @ e[: t + 1].sum(0) % 2 + mm[t]) % 2 for t in range(d_t)]
        det = [s_hat[0]] + [(s_hat[t] ^ s_hat[t - 1]) for t in range(1, d_t)]
        det = np.concatenate(det) % 2
        # linear: H' @ fault vector
        f = np.concatenate([e.reshape(-1), mm[:-1].reshape(-1)])
        hp = spacetime_matrix(h, d_t)
        np.testing.assert_array_equal((hp @ f) % 2, det)


def test_spacetime_graph_structure():
    g = build_spacetime_code("surface", 3, 3, meas_ratio=0.5)
    hx, hz = surface_code_checks(3)
    m, n = hz.shape
    assert g.n_checks == m * 3
    assert g.n_qubits == n * 3 + m * 2
    assert g.n_checks_x == 0
    # rate scaling: data faults 1.0, measurement faults 0.5
    rs = np.asarray(g.rate_scale)
    assert (rs[: n * 3] == 1.0).all()
    assert (rs[n * 3 : g.n_qubits] == 0.5).all()
    assert (rs[g.n_qubits :] == 0.0).all()


def test_spacetime_sampling_and_labels():
    g = build_spacetime_code("surface", 3, 3)
    b = sample_batch(jax.random.PRNGKey(0), g, 0.03, 256)
    assert not np.asarray(b.ez).any()                      # single sector
    # syndrome consistency of the pure error
    ex0 = jnp.mod(b.syndrome @ g.pure_ex.T, 2.0)
    s2 = syndrome(g, ex0, jnp.zeros_like(ex0))
    np.testing.assert_array_equal(np.asarray(s2), np.asarray(b.syndrome))
    # an undetectable logical fault = the base code's X logical dropped into
    # one data block: syndrome unchanged, class bit flips
    from tpugnn.sampling import logical_class_bits

    base = build_code("surface", 3)
    lx = np.asarray(base.logicals_x)[0, : base.n_qubits]
    fault = np.zeros(g.n_qubits_pad, np.float32)
    fault[: base.n_qubits] = lx  # data block tau=0
    ex2 = jnp.mod(b.ex + jnp.asarray(fault)[None, :], 2.0)
    s3 = syndrome(g, ex2, b.ez)
    np.testing.assert_array_equal(np.asarray(s3), np.asarray(b.syndrome))
    bits0 = np.asarray(b.class_bits)
    bits1 = np.asarray(logical_class_bits(g, ex2, b.ez, s3))
    np.testing.assert_array_equal(bits1[:, 0], (bits0[:, 0] + 1) % 2)


def test_meas_rate_statistics():
    g = build_spacetime_code("surface", 3, 3, meas_ratio=0.25)
    b = sample_batch(jax.random.PRNGKey(1), g, 0.2, 20000)
    ex = np.asarray(b.ex)
    n_data = 9 * 3
    data_rate = ex[:, :n_data].mean()
    meas_rate = ex[:, n_data : g.n_qubits].mean()
    assert abs(data_rate - 0.2) < 0.01
    assert abs(meas_rate - 0.05) < 0.005


def test_uf_decodes_spacetime():
    """The union-find baseline runs on the detector graph (degree <= 2)."""
    from tpugnn.eval.baseline import ler_union_find

    g3 = build_spacetime_code("surface", 3, 3)
    ev3 = ler_union_find(g3, p=0.01, shots=4096, batch=2048,
                         key=jax.random.PRNGKey(2))
    assert ev3["syn_mismatch_rate"] == 0.0
    g5 = build_spacetime_code("surface", 5, 5)
    ev5 = ler_union_find(g5, p=0.01, shots=4096, batch=2048,
                         key=jax.random.PRNGKey(2))
    assert ev5["syn_mismatch_rate"] == 0.0
    # below threshold: scaling (d, d_t) up reduces LER
    assert ev5["ler"] < ev3["ler"]


def test_gnn_trains_on_spacetime():
    from tpugnn.configs import CodeConfig, ExperimentConfig, ModelConfig, TrainConfig
    from tpugnn.eval import ler_monte_carlo
    from tpugnn.train import train

    g = build_spacetime_code("surface", 3, 3)
    cfg = ExperimentConfig(
        code=CodeConfig(family="surface", distance=3, p=0.02),
        model=ModelConfig(hidden=32, msg_hidden=32, rounds=4, backend="fused"),
        train=TrainConfig(batch=128, steps=150, warmup_steps=20, eval_every=150,
                          eval_shots=512),
    )
    state, model, _, hist = train(cfg, graph=g, log=lambda *_: None)
    assert np.isfinite(hist[-1]["loss"])
    ev = ler_monte_carlo(model.apply, state.params, g, p=0.02, shots=1024,
                         batch=512, key=jax.random.PRNGKey(5))
    assert ev["ler_logical"] < 0.5  # learning signal on detector graphs

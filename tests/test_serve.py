"""DecodeEngine: padding, chunking, checkpoint loading."""

import numpy as np
import jax
import pytest

from tpugnn.configs import CodeConfig, ExperimentConfig, ModelConfig, TrainConfig
from tpugnn.sampling import sample_batch, syndrome
from tpugnn.serve import DecodeEngine
from tpugnn.tanner import build_code
from tpugnn.train import init_state


@pytest.fixture(scope="module")
def engine():
    cfg = ExperimentConfig(
        code=CodeConfig(family="surface", distance=3),
        model=ModelConfig(hidden=16, msg_hidden=16, rounds=2, backend="fused"),
    )
    graph = build_code("surface", 3)
    state, _ = init_state(cfg, graph)
    return DecodeEngine(cfg, state.params, graph, max_batch=32), graph


def test_decode_shapes_and_chunking(engine):
    eng, graph = engine
    b = sample_batch(jax.random.PRNGKey(0), graph, 0.08, 80)  # > 2 chunks
    out = eng.decode(np.asarray(b.syndrome))
    assert out.shape == (80, graph.n_qubits, 2)
    assert set(np.unique(out)) <= {0, 1}


def test_decode_accepts_unpadded_width(engine):
    eng, graph = engine
    s = np.zeros((4, graph.n_checks))  # real width, no padding
    out = eng.decode(s)
    assert out.shape == (4, graph.n_qubits, 2)


def test_decode_rejects_oversized(engine):
    eng, graph = engine
    with pytest.raises(ValueError, match="exceeds"):
        eng.decode(np.zeros((2, graph.n_checks_pad + 8)))


def test_from_checkpoint(tmp_path):
    cfg = ExperimentConfig(
        code=CodeConfig(family="repetition", distance=5, p=0.1),
        model=ModelConfig(hidden=8, msg_hidden=8, rounds=2, backend="fused"),
        train=TrainConfig(batch=16, steps=3, warmup_steps=1, eval_every=10,
                          eval_shots=32, checkpoint_dir=str(tmp_path / "ck")),
    )
    from tpugnn.train import train

    train(cfg, log=lambda *_: None)
    eng = DecodeEngine.from_checkpoint(str(tmp_path / "ck"), cfg, max_batch=16)
    out = eng.decode(np.zeros((3, 4)))
    assert out.shape == (3, 5, 2)


def test_from_checkpoint_missing(tmp_path):
    cfg = ExperimentConfig(
        code=CodeConfig(family="repetition", distance=5),
        model=ModelConfig(hidden=8, msg_hidden=8, rounds=2, backend="fused"),
    )
    with pytest.raises(FileNotFoundError):
        DecodeEngine.from_checkpoint(str(tmp_path / "nope"), cfg)


def test_data_parallel_matches_single_device():
    cfg = ExperimentConfig(
        code=CodeConfig(family="surface", distance=3),
        model=ModelConfig(hidden=16, msg_hidden=16, rounds=2, backend="fused"),
    )
    graph = build_code("surface", 3)
    state, _ = init_state(cfg, graph)
    single = DecodeEngine(cfg, state.params, graph, max_batch=32)
    dp = DecodeEngine(cfg, state.params, graph, max_batch=32,
                      data_parallel=min(4, len(jax.devices())))
    b = sample_batch(jax.random.PRNGKey(7), graph, 0.08, 32)
    s = np.asarray(b.syndrome)
    np.testing.assert_array_equal(single.decode(s), dp.decode(s))


def test_data_parallel_validates():
    cfg = ExperimentConfig(
        code=CodeConfig(family="surface", distance=3),
        model=ModelConfig(hidden=16, msg_hidden=16, rounds=2, backend="fused"),
    )
    graph = build_code("surface", 3)
    state, _ = init_state(cfg, graph)
    with pytest.raises(ValueError, match="divide"):
        DecodeEngine(cfg, state.params, graph, max_batch=10, data_parallel=4)
    with pytest.raises(ValueError, match="devices"):
        DecodeEngine(cfg, state.params, graph, max_batch=32,
                     data_parallel=4096)


def test_best_of_serving_is_syndrome_consistent():
    """cleanup='best_of': every served correction reproduces the observed
    syndrome (all candidates are consistent; the raw head is gated out when
    it is not), even for an untrained GNN."""
    cfg = ExperimentConfig(
        code=CodeConfig(family="surface", distance=3, p=0.05),
        model=ModelConfig(hidden=16, msg_hidden=16, rounds=2, backend="fused",
                          readout="both", qubit_head="pauli4"),
    )
    graph = build_code("surface", 3)
    state, _ = init_state(cfg, graph)
    eng = DecodeEngine(cfg, state.params, graph, max_batch=32,
                       cleanup="best_of")
    b = sample_batch(jax.random.PRNGKey(3), graph, 0.08, 48)
    syn = np.asarray(b.syndrome)[:, : graph.n_checks]
    corr = eng.decode(syn)
    assert corr.shape == (48, graph.n_qubits, 2)
    n = graph.n_qubits
    h_ex = np.asarray(graph.h_syn_ex)[: graph.n_checks, :n].astype(np.uint8)
    h_ez = np.asarray(graph.h_syn_ez)[: graph.n_checks, :n].astype(np.uint8)
    s_hat = ((corr[:, :, 0] @ h_ex.T) + (corr[:, :, 1] @ h_ez.T)) % 2
    np.testing.assert_array_equal(s_hat, syn.astype(np.uint8))


def test_best_of_lazy_serving_consistent_and_agrees():
    """lazy=True best_of: still syndrome-consistent everywhere, and
    bit-identical to the exact engine on every shot where the GNN
    correction already reproduced the syndrome via a zero residual is not
    guaranteed — but the LAZY and EXACT engines must agree on all shots
    where the exact engine did NOT pick the raw-MWPM candidate, and in
    particular always where the residual is nonzero (full candidate set)."""
    cfg = ExperimentConfig(
        code=CodeConfig(family="surface", distance=3, p=0.05),
        model=ModelConfig(hidden=16, msg_hidden=16, rounds=2, backend="fused",
                          readout="both", qubit_head="pauli4"),
    )
    graph = build_code("surface", 3)
    state, _ = init_state(cfg, graph)
    eager = DecodeEngine(cfg, state.params, graph, max_batch=32,
                         cleanup="best_of")
    lazy = DecodeEngine(cfg, state.params, graph, max_batch=32,
                        cleanup="best_of", lazy=True)
    b = sample_batch(jax.random.PRNGKey(9), graph, 0.08, 64)
    syn = np.asarray(b.syndrome)[:, : graph.n_checks]
    c_e = eager.decode(syn)
    c_l = lazy.decode(syn)
    n = graph.n_qubits
    h_ex = np.asarray(graph.h_syn_ex)[: graph.n_checks, :n].astype(np.uint8)
    h_ez = np.asarray(graph.h_syn_ez)[: graph.n_checks, :n].astype(np.uint8)
    for corr in (c_e, c_l):
        s_hat = ((corr[:, :, 0] @ h_ex.T) + (corr[:, :, 1] @ h_ez.T)) % 2
        np.testing.assert_array_equal(s_hat, syn.astype(np.uint8))
    # lazy may differ from eager only where eager's winner was raw MWPM on
    # an already-consistent shot; never where the correction weight of the
    # lazy answer would be lighter (lazy's candidate set is a subset)
    we = (c_e[:, :, 0] | c_e[:, :, 1]).sum(axis=1)
    wl = (c_l[:, :, 0] | c_l[:, :, 1]).sum(axis=1)
    assert (wl >= we).all()


def test_best_of_nll_selection_consistent(engine_setup=None):
    """select_cost='nll' serving: posterior-likelihood best-of decodes are
    syndrome-consistent and the nlp side tensor flows through the packed
    wire + threaded drain."""
    import numpy as np

    import jax

    from tpugnn.configs import CodeConfig, ExperimentConfig, ModelConfig
    from tpugnn.sampling import sample_batch
    from tpugnn.serve import DecodeEngine
    from tpugnn.tanner import build_code
    from tpugnn.train.loop import init_state

    cfg = ExperimentConfig(
        code=CodeConfig(family="surface", distance=3, p=0.05),
        model=ModelConfig(hidden=16, msg_hidden=16, rounds=2))
    g = build_code("surface", 3)
    state, _ = init_state(cfg, g)
    eng = DecodeEngine(cfg, state.params, g, max_batch=32,
                       cleanup="best_of", lazy=True, select_cost="nll")
    b = sample_batch(jax.random.PRNGKey(3), g, 0.05, 100)  # multi-chunk
    out = eng.decode(np.asarray(b.syndrome))
    assert out.shape == (100, g.n_qubits, 2)
    hx = np.asarray(g.h_syn_ez)[: g.n_checks, : g.n_qubits]
    hz = np.asarray(g.h_syn_ex)[: g.n_checks, : g.n_qubits]
    s_hat = (out[:, :, 0] @ hz.T + out[:, :, 1] @ hx.T) % 2
    np.testing.assert_array_equal(
        s_hat, np.asarray(b.syndrome)[:, : g.n_checks])


def test_select_cost_validation():
    import pytest as _pytest

    from tpugnn.configs import CodeConfig, ExperimentConfig, ModelConfig
    from tpugnn.serve import DecodeEngine
    from tpugnn.tanner import build_code
    from tpugnn.train.loop import init_state

    cfg = ExperimentConfig(
        code=CodeConfig(family="surface", distance=3, p=0.05),
        model=ModelConfig(hidden=16, msg_hidden=16, rounds=2))
    g = build_code("surface", 3)
    state, _ = init_state(cfg, g)
    with _pytest.raises(ValueError, match="select_cost"):
        DecodeEngine(cfg, state.params, g, max_batch=8, select_cost="foo")
    with _pytest.raises(ValueError, match="best_of"):
        DecodeEngine(cfg, state.params, g, max_batch=8, cleanup="uf",
                     select_cost="nll")

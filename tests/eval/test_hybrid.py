"""GNN + classical-cleanup hybrid decoder (tpugnn/eval/hybrid.py).

Invariants:
* the combined correction is syndrome-consistent by construction
  (syn_mismatch_rate == 0) even for an untrained GNN;
* with the confidence gate closed (tau > 1) the hybrid degenerates to the
  pure cleanup decoder on the same sampled shots — LERs match exactly;
* a trained-enough GNN never loses to its own cleanup decoder by a large
  margin (smoke bound only; the quality claim lives in the 1M-shot table).
"""

from __future__ import annotations

import jax
import numpy as np
import pytest

from tpugnn.configs import CodeConfig, ExperimentConfig, ModelConfig, TrainConfig
from tpugnn.eval.baseline import ler_union_find
from tpugnn.eval.hybrid import ler_best_of, ler_gnn_cleanup
from tpugnn.tanner import build_code
from tpugnn.train.loop import init_state


@pytest.fixture(scope="module")
def setup():
    graph = build_code("surface", 3)
    cfg = ExperimentConfig(
        code=CodeConfig(family="surface", distance=3, p=0.05),
        model=ModelConfig(hidden=32, msg_hidden=32, rounds=3, backend="fused",
                          readout="both", qubit_head="pauli4"),
        train=TrainConfig(batch=64, steps=1),
    )
    state, model = init_state(cfg, graph)
    return graph, model, state


def test_cleanup_is_syndrome_consistent(setup):
    graph, model, state = setup
    res = ler_gnn_cleanup(
        model.apply, state.params, graph,
        p=0.05, shots=512, batch=256, key=jax.random.PRNGKey(3),
        cleanup="uf",
    )
    assert res["syn_mismatch_rate"] == 0.0
    assert 0.0 <= res["ler"] <= 1.0


def test_closed_gate_equals_pure_cleanup(setup):
    graph, model, state = setup
    key = jax.random.PRNGKey(7)
    res_h = ler_gnn_cleanup(
        model.apply, state.params, graph,
        p=0.05, shots=512, batch=256, key=key, cleanup="uf", tau=1.5,
    )
    res_uf = ler_union_find(graph, p=0.05, shots=512, batch=256, key=key)
    assert res_h["ler"] == res_uf["ler"]


def test_mwpm_cleanup_runs(setup):
    graph, model, state = setup
    res = ler_gnn_cleanup(
        model.apply, state.params, graph,
        p=0.05, shots=256, batch=256, key=jax.random.PRNGKey(5),
        cleanup="mwpm",
    )
    assert res["syn_mismatch_rate"] == 0.0


def test_logical_head_correction_realizes_class(setup):
    """Feeding the TRUE class bits as logits yields a zero-failure
    correction: consistency + symplectic pairing of the logical tables."""
    import jax.numpy as jnp
    import numpy as np

    from tpugnn.eval.hybrid import logical_head_correction
    from tpugnn.sampling import sample_batch
    from tpugnn.sampling.noise import syndrome as syn_of

    graph, model, state = setup
    b = sample_batch(jax.random.PRNGKey(11), graph, 0.08, 128)
    fake_logits = 2.0 * b.class_bits - 1.0       # >0 iff bit set
    ex_h, ez_h = logical_head_correction(graph, b.syndrome, fake_logits)
    # consistent
    np.testing.assert_array_equal(
        np.asarray(syn_of(graph, ex_h, ez_h)), np.asarray(b.syndrome))
    # in the true class: residual commutes with all logicals
    rx = np.asarray(jnp.mod(b.ex + ex_h, 2.0))
    rz = np.asarray(jnp.mod(b.ez + ez_h, 2.0))
    lz = np.asarray(graph.logicals_z)
    lx = np.asarray(graph.logicals_x)
    assert not ((rx @ lz.T) % 2).any()
    assert not ((rz @ lx.T) % 2).any()


def test_best_of_runs_and_tracks_best_member(setup):
    graph, model, state = setup
    res = ler_best_of(
        model.apply, state.params, graph,
        p=0.05, shots=1024, batch=512, key=jax.random.PRNGKey(13))
    mw = ler_gnn_cleanup(
        model.apply, state.params, graph,
        p=0.05, shots=1024, batch=512, key=jax.random.PRNGKey(13),
        cleanup="mwpm")
    assert 0.0 <= res["ler"] <= 1.0
    assert sum(res["picked"].values()) == 1024
    # min-weight selection over a set containing gnn_mwpm should not be
    # dramatically worse than gnn_mwpm alone (statistical smoke bound)
    assert res["ler"] <= mw["ler"] + 3 * mw["ler_stderr"] + 0.02


def test_unified_matches_legacy_columns(setup):
    """ler_all_columns must reproduce each legacy evaluator bit-for-bit:
    same master key => same chunk key schedule => same sampled shots and
    identical per-column failure counts."""
    from tpugnn.eval.hybrid import ler_all_columns
    from tpugnn.eval.ler import ler_monte_carlo

    graph, model, state = setup
    kw = dict(p=0.06, shots=512, batch=256, key=jax.random.PRNGKey(11))
    u = ler_all_columns(model.apply, state.params, graph,
                        with_uf_raw=True, **kw)
    ev = ler_monte_carlo(model.apply, state.params, graph, **kw)
    guf = ler_gnn_cleanup(model.apply, state.params, graph, cleanup="uf", **kw)
    gmw = ler_gnn_cleanup(model.apply, state.params, graph, cleanup="mwpm",
                          **kw)
    gbo = ler_best_of(model.apply, state.params, graph, **kw)
    uf = ler_union_find(graph, **kw)
    assert u["ler"] == ev["ler"]
    assert u["ler_logical"] == ev["ler_logical"]
    assert u["ler_hybrid"] == ev["ler_hybrid"]
    assert u["gnn_uf"] == guf["ler"]
    assert u["gnn_mwpm"] == gmw["ler"]
    assert u["gnn_best_of"] == gbo["ler"]
    assert u["picked"] == gbo["picked"]
    assert u["uf"] == uf["ler"]


def test_lazy_decode_matches_eager(setup):
    """lazy_decode (zero-syndrome rows skipped) must be bit-identical to the
    eager batch decode for both UF and MWPM, including all-zero rows."""
    from tpugnn.baselines.mwpm import MWPMDecoder
    from tpugnn.baselines.union_find import UnionFindDecoder
    from tpugnn.eval.hybrid import lazy_decode
    from tpugnn.sampling import sample_batch

    graph, model, state = setup
    b = sample_batch(jax.random.PRNGKey(21), graph, 0.03, 64)
    syn = np.asarray(b.syndrome).astype(np.uint8)
    syn[::3] = 0  # force a mix of zero and nonzero rows
    for dec in (UnionFindDecoder(graph), MWPMDecoder(graph)):
        ex_l, ez_l = lazy_decode(dec, syn)
        ex_e, ez_e = dec.decode(syn)
        np.testing.assert_array_equal(ex_l, np.asarray(ex_e, np.uint8))
        np.testing.assert_array_equal(ez_l, np.asarray(ez_e, np.uint8))
        # explicit all-zero batch -> all-zero corrections
        zx, zz = lazy_decode(dec, np.zeros_like(syn))
        assert not zx.any() and not zz.any()


def test_unified_matches_best_of_with_tau_per_qubit():
    """ADVICE r2 item 2: for a per_qubit model with tau set, ler_all_columns'
    gnn_best_of must match ler_best_of (gated fallback for the 'logical'
    candidate)."""
    from tpugnn.eval.hybrid import ler_all_columns

    graph = build_code("surface", 3)
    cfg = ExperimentConfig(
        code=CodeConfig(family="surface", distance=3, p=0.05),
        model=ModelConfig(hidden=32, msg_hidden=32, rounds=3, backend="fused",
                          readout="per_qubit", qubit_head="pauli4"),
        train=TrainConfig(batch=64, steps=1),
    )
    state, model = init_state(cfg, graph)
    kw = dict(p=0.06, shots=256, batch=128, key=jax.random.PRNGKey(17),
              tau=0.9)
    u = ler_all_columns(model.apply, state.params, graph, **kw)
    gbo = ler_best_of(model.apply, state.params, graph, **kw)
    assert u["gnn_best_of"] == gbo["ler"]
    assert u["picked"] == gbo["picked"]


def test_mwpm_raw_requires_mwpm(setup):
    """ADVICE r2 item 1: with_mwpm_raw without with_mwpm must not report a
    spuriously perfect mwpm=0.0 column."""
    from tpugnn.eval.hybrid import ler_all_columns

    graph, model, state = setup
    u = ler_all_columns(model.apply, state.params, graph,
                        p=0.06, shots=128, batch=128,
                        key=jax.random.PRNGKey(19),
                        with_mwpm=False, with_mwpm_raw=True)
    assert u["mwpm"] is None


def test_min_weight_select_nll_overrides_weight():
    """Posterior-likelihood selection picks the candidate the model believes,
    even when it has LARGER support weight (the circuit-level misranking the
    weight rule suffered — round 4)."""
    import numpy as np

    from tpugnn.eval.hybrid import NLP_SCALE, min_weight_select

    B, n, m = 1, 4, 2
    # candidate A: single flip on qubit 0 (weight 1)
    # candidate B: flips on qubits 1 and 2 (weight 2)
    cands = {
        "gnn_uf": (np.array([[1, 0, 0, 0]], np.uint8),
                   np.zeros((B, n), np.uint8)),
        "mwpm": (np.array([[0, 1, 1, 0]], np.uint8),
                 np.zeros((B, n), np.uint8)),
    }
    syn = np.zeros((B, m), np.uint8)
    hz = np.zeros((m, n), np.uint8)
    hx = np.zeros((m, n), np.uint8)

    # weight rule: A wins (1 < 2)
    _, _, choice = min_weight_select(("gnn_uf", "mwpm"), cands, syn, hz, hx)
    assert choice[0] == 0

    # posterior: the model is confident qubits 1,2 are X-flipped and
    # qubit 0 is clean -> B wins under NLL despite double the weight
    nlp = np.zeros((B, n, 4), np.uint8)
    cheap, dear = 0, int(8 * NLP_SCALE)
    nlp[0, 0] = [cheap, dear, dear, dear]   # q0: I likely
    nlp[0, 1] = [dear, cheap, dear, dear]   # q1: X likely
    nlp[0, 2] = [dear, cheap, dear, dear]   # q2: X likely
    nlp[0, 3] = [cheap, dear, dear, dear]
    _, _, choice = min_weight_select(("gnn_uf", "mwpm"), cands, syn, hz, hx,
                                     nlp=nlp)
    assert choice[0] == 1

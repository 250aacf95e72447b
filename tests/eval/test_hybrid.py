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
from tpugnn.eval.hybrid import ler_gnn_cleanup
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

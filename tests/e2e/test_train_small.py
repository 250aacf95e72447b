"""End-to-end PR1 gate (BASELINE.json configs[0]): surface d=3, p=0.05, CPU.

Trains the decoder briefly and checks that it actually learns: loss drops,
LER beats the untrained model, and physics sanity holds (LER ~ 0 at p -> 0).
"""

import jax
import pytest

from tpugnn.configs import CodeConfig, ExperimentConfig, ModelConfig, TrainConfig
from tpugnn.eval import ler_monte_carlo
from tpugnn.train import init_state, train
from tpugnn.tanner import build_code


def _cfg(**train_kw):
    return ExperimentConfig(
        code=CodeConfig(family="surface", distance=3, p=0.05),
        model=ModelConfig(hidden=32, msg_hidden=32, rounds=4),
        train=TrainConfig(
            batch=128, steps=300, lr=2e-3, warmup_steps=20,
            eval_every=300, eval_shots=1024, **train_kw,
        ),
    )


@pytest.fixture(scope="module")
def trained():
    cfg = _cfg()
    state, model, graph, history = train(cfg, log=lambda *_: None)
    return cfg, state, model, graph, history


def test_loss_decreases(trained):
    cfg, state, model, graph, history = trained
    assert history, "no eval points recorded"
    assert history[-1]["loss"] < 0.7  # BCE starts near log(2) ~ 0.69 x heads


def test_beats_untrained(trained):
    cfg, state, model, graph, history = trained
    fresh, _ = init_state(cfg, graph)
    ev_fresh = ler_monte_carlo(
        model.apply, fresh.params, graph, p=0.05, shots=2048, batch=1024,
        key=jax.random.PRNGKey(42),
    )
    ev_trained = ler_monte_carlo(
        model.apply, state.params, graph, p=0.05, shots=2048, batch=1024,
        key=jax.random.PRNGKey(42),
    )
    assert ev_trained["ler"] < ev_fresh["ler"]
    # a briefly-trained d=3 decoder at p=0.05 should be meaningfully below
    # the ~50% of an untrained model (full convergence is covered by the
    # longer quality runs in runs/)
    assert ev_trained["ler"] < 0.4


def test_ler_vanishes_at_low_p(trained):
    cfg, state, model, graph, history = trained
    ev = ler_monte_carlo(
        model.apply, state.params, graph, p=1e-4, shots=2048, batch=1024,
        key=jax.random.PRNGKey(7),
    )
    assert ev["ler"] < 0.02


def test_logical_head_learns(trained):
    cfg, state, model, graph, history = trained
    ev = ler_monte_carlo(
        model.apply, state.params, graph, p=0.05, shots=2048, batch=1024,
        key=jax.random.PRNGKey(11),
    )
    assert ev["ler_logical"] < 0.45


def test_toric_e2e_smoke():
    """BASELINE configs[3]: the toric variant trains end-to-end."""
    cfg = ExperimentConfig(
        code=CodeConfig(family="toric", distance=3, p=0.05),
        model=ModelConfig(hidden=32, msg_hidden=32, rounds=4, backend="fused"),
        train=TrainConfig(batch=128, steps=150, lr=2e-3, warmup_steps=20,
                          eval_every=150, eval_shots=512),
    )
    state, model, graph, history = train(cfg, log=lambda *_: None)
    assert graph.k == 2
    assert history[-1]["loss"] < 1.0
    assert history[-1]["ler"] < 0.9  # learning signal present

"""Resumable Monte-Carlo shot accumulation [VERDICT r3 missing-3].

The r3a 100M-shot stage burned 2h for zero output because ler_all_columns
could not checkpoint partial shots.  These tests pin the contract:

* an interrupted run + a resumed run produce the SAME result (bit-for-bit
  counters and key stream) as one uninterrupted run;
* each flush hands the caller a partial result whose shot count matches the
  accumulated chunks;
* the progress file is removed once the request completes.
"""

import os

import jax
import pytest

from tpugnn.configs import CodeConfig, ExperimentConfig, ModelConfig
from tpugnn.eval.hybrid import ler_all_columns
from tpugnn.tanner import build_code
from tpugnn.train.loop import init_state


@pytest.fixture(scope="module")
def setup():
    graph = build_code("surface", 3)
    cfg = ExperimentConfig(
        code=CodeConfig(family="surface", distance=3),
        model=ModelConfig(hidden=32, msg_hidden=32, rounds=2,
                          backend="fused", qubit_head="pauli4"),
    )
    state, model = init_state(cfg, graph)
    return model.apply, state.params, graph


class _Abort(Exception):
    pass


def _run(apply_fn, params, graph, *, shots, progress_path=None,
         abort_after=None, flush_every=2, on_partial=None):
    calls = {"n": 0}

    def on_progress(partial):
        calls["n"] += 1
        if on_partial is not None:
            on_partial(partial)
        if abort_after is not None and calls["n"] >= abort_after:
            raise _Abort

    res = ler_all_columns(
        apply_fn, params, graph, p=0.05, shots=shots, batch=64,
        key=jax.random.PRNGKey(5), progress_path=progress_path,
        flush_every=flush_every,
        on_progress=on_progress if progress_path else None)
    return res


def test_resume_bit_exact(setup, tmp_path):
    apply_fn, params, graph = setup
    shots = 6 * 64
    ref = _run(apply_fn, params, graph, shots=shots)

    prog = str(tmp_path / "p.progress.json")
    with pytest.raises(_Abort):
        _run(apply_fn, params, graph, shots=shots, progress_path=prog,
             abort_after=1)
    # the kill landed after 2 of 6 chunks; the progress file must exist
    assert os.path.exists(prog)
    res = _run(apply_fn, params, graph, shots=shots, progress_path=prog)
    for k in ("ler", "gnn_uf", "gnn_mwpm", "gnn_best_of", "mwpm",
              "ler_logical", "ler_hybrid", "shots"):
        assert res[k] == ref[k], k
    assert res["picked"] == ref["picked"]
    # completed request: progress file cleaned up
    assert not os.path.exists(prog)


def test_partial_results_monotonic(setup, tmp_path):
    apply_fn, params, graph = setup
    prog = str(tmp_path / "q.progress.json")
    partials = []
    _run(apply_fn, params, graph, shots=6 * 64, progress_path=prog,
         on_partial=partials.append)
    assert [int(p["shots"]) for p in partials] == [128, 256, 384]
    for p in partials:
        assert 0.0 <= p["gnn_best_of"] <= p["ler"] <= 1.0 or p["ler"] == 0.0


def test_foreign_progress_ignored(setup, tmp_path):
    """A progress file from a different configuration must not resume."""
    apply_fn, params, graph = setup
    prog = str(tmp_path / "r.progress.json")
    with pytest.raises(_Abort):
        _run(apply_fn, params, graph, shots=6 * 64, progress_path=prog,
             abort_after=1)
    # different p -> fingerprint mismatch -> starts clean (256 shots would
    # otherwise leak into the new accumulation)
    res = ler_all_columns(apply_fn, params, graph, p=0.03, shots=2 * 64,
                          batch=64, key=jax.random.PRNGKey(5),
                          progress_path=prog)
    assert int(res["shots"]) == 128

"""Circuit-level noise: closed-form detector model vs explicit simulation.

The closed-form rules in tanner/circuit.py (single detector per adjacent
check at round t or t+1; hook propagation through later CNOT layers) are
validated here against an independent layer-by-layer X-frame simulation of
the extraction circuit, plus pipeline/physics tests.
"""

import jax
import numpy as np
import pytest

from tpugnn.sampling import sample_batch, syndrome
from tpugnn.tanner import build_code
from tpugnn.tanner.circuit import (
    SCALE_CNOT,
    SCALE_IDLE,
    SCALE_MEAS,
    SCALE_PREP,
    build_circuit_code,
    circuit_fault_classes,
    elementary_faults,
    fault_effect,
    repetition_schedule,
    surface_schedule,
    toric_schedule,
)
from tpugnn.tanner.repetition import repetition_code_checks
from tpugnn.tanner.surface import surface_code_checks
from tpugnn.tanner.toric import toric_code_checks

CHECKS = {"surface": surface_code_checks, "toric": toric_code_checks,
          "repetition": repetition_code_checks}
SCHEDULES = {"surface": surface_schedule, "toric": toric_schedule,
             "repetition": repetition_schedule}


def simulate_circuit(own_sched, other_sched, n_data, d_t, prims):
    """Explicit X-frame simulation of the extraction circuit.

    Layer-by-layer: own-check CNOTs copy the CURRENT data frame onto the
    check's accumulator at their scheduled layer; an X sitting on an
    other-sector ancilla copies onto its partner data qubit at each of its
    remaining CNOT layers; faults land at their (round, after-layer) time.
    Returns (difference detectors [m*d_t], final data frame [n_data]).
    """
    m = len(own_sched)
    x = np.zeros(n_data, np.uint8)
    outcomes = np.zeros((d_t, m), np.uint8)
    for t in range(d_t):
        for p in prims:  # pre-round data faults
            if p[0] == "data" and p[2] == t and p[3] == -1:
                x[p[1]] ^= 1
        acc = np.zeros(m, np.uint8)
        anc = np.zeros(len(other_sched), np.uint8)
        for layer in range(4):
            for c, qs in enumerate(own_sched):
                for q, s in qs:
                    if s == layer:
                        acc[c] ^= x[q]
            for j, qs in enumerate(other_sched):
                if anc[j]:
                    for q, s in qs:
                        if s == layer:
                            x[q] ^= 1
            for p in prims:  # faults after this layer
                if p[0] == "data" and p[2] == t and p[3] == layer:
                    x[p[1]] ^= 1
                elif p[0] == "otheranc" and p[2] == t and p[3] == layer:
                    anc[p[1]] ^= 1
        for p in prims:
            if p[0] == "ownmeas" and p[2] == t:
                acc[p[1]] ^= 1
        outcomes[t] = acc
    det = outcomes.copy()
    det[1:] ^= outcomes[:-1]
    return det.reshape(-1), x


@pytest.mark.parametrize(
    "family,d,d_t",
    [("surface", 3, 3), ("surface", 3, 2), ("surface", 5, 3),
     ("toric", 3, 3), ("toric", 2, 2), ("repetition", 5, 3)],
)
def test_closed_form_matches_simulation(family, d, d_t):
    """Every elementary fault's (symptom, e_net) matches the simulator."""
    hx, hz = CHECKS[family](d)
    x_sched, z_sched = SCHEDULES[family](d)
    n = hx.shape[1]
    m = len(z_sched)
    for prims, _ in elementary_faults(z_sched, x_sched, n, d_t):
        det_sim, x_sim = simulate_circuit(z_sched, x_sched, n, d_t, prims)
        eff = fault_effect(prims, z_sched, x_sched, n, d_t)
        sym = np.zeros(m * d_t, np.uint8)
        err = np.zeros(n, np.uint8)
        if eff is not None:
            sym[sorted(eff[0])] = 1
            err[sorted(eff[1])] = 1
        np.testing.assert_array_equal(sym, det_sim, err_msg=f"prims={prims}")
        np.testing.assert_array_equal(err, x_sim, err_msg=f"prims={prims}")


def test_random_fault_combinations_match_simulation():
    """Linearity: XOR of random fault subsets matches the simulator too."""
    d, d_t = 3, 3
    x_sched, z_sched = surface_schedule(d)
    n = d * d
    m = len(z_sched)
    faults = elementary_faults(z_sched, x_sched, n, d_t)
    rng = np.random.default_rng(0)
    for _ in range(20):
        sel = rng.random(len(faults)) < 0.1
        prims = [p for (ps, _), s in zip(faults, sel) if s for p in ps]
        det_sim, x_sim = simulate_circuit(z_sched, x_sched, n, d_t, prims)
        eff = fault_effect(prims, z_sched, x_sched, n, d_t)
        sym = np.zeros(m * d_t, np.uint8)
        err = np.zeros(n, np.uint8)
        if eff is not None:
            sym[sorted(eff[0])] = 1
            err[sorted(eff[1])] = 1
        np.testing.assert_array_equal(sym, det_sim)
        np.testing.assert_array_equal(err, x_sim)


@pytest.mark.parametrize("family", ["surface", "toric", "repetition"])
def test_schedule_is_conflict_free_and_matches_checks(family):
    for d in (3, 5, 7):
        hx, hz = CHECKS[family](d)
        x_sched, z_sched = SCHEDULES[family](d)
        assert len(x_sched) == hx.shape[0] and len(z_sched) == hz.shape[0]
        # supports match row for row
        for sched, hmat in ((x_sched, hx), (z_sched, hz)):
            for c, qs in enumerate(sched):
                assert sorted(q for q, _ in qs) == sorted(
                    np.nonzero(hmat[c])[0].tolist()
                )
        # no data qubit does two CNOTs in one layer
        for layer in range(4):
            busy = set()
            for qs in x_sched + z_sched:
                for q, s in qs:
                    if s == layer:
                        assert q not in busy, (d, layer, q)
                        busy.add(q)


def test_dt1_reduces_to_code_capacity():
    """One perfect round -> exactly the base code's Hz (data idles only)."""
    d = 3
    hx, hz = surface_code_checks(d)
    x_sched, z_sched = surface_schedule(d)
    hp, e_net, rate = circuit_fault_classes(z_sched, x_sched, d * d, 1)
    assert hp.shape[1] == d * d
    # each class is a single-qubit idle; columns match hz's columns
    order = np.lexsort(e_net.T[::-1])
    np.testing.assert_array_equal(e_net.sum(1), 1)
    cols = hp[:, np.argsort(np.argmax(e_net, 1))]
    np.testing.assert_array_equal(cols, hz)
    assert np.allclose(rate, SCALE_IDLE)


def test_hooks_and_merged_rates():
    d, d_t = 3, 3
    x_sched, z_sched = surface_schedule(d)
    hp, e_net, rate = circuit_fault_classes(z_sched, x_sched, d * d, d_t)
    # hook classes: multi-qubit net data errors from single ancilla faults
    assert (e_net.sum(1) >= 2).any(), "no hook errors found"
    # measurement-flip class of a bulk (degree-4) Z-check at round 0:
    # prep + meas + one ancilla-X per own CNOT merge into one class
    m = len(z_sched)
    bulk = [c for c, qs in enumerate(z_sched) if len(qs) == 4][0]
    sym = np.zeros(m * d_t, np.uint8)
    sym[[0 * m + bulk, 1 * m + bulk]] = 1
    j = [jj for jj in range(hp.shape[1])
         if (hp[:, jj] == sym).all() and e_net[jj].sum() == 0]
    assert len(j) == 1
    expect = SCALE_PREP + SCALE_MEAS + 4 * SCALE_CNOT
    np.testing.assert_allclose(rate[j[0]], expect, rtol=1e-6)


def test_circuit_graph_pipeline():
    """build_circuit_code -> sampling -> syndrome consistency -> decoder."""
    g = build_circuit_code("surface", 3, 3)
    assert g.n_checks_x == 0 and g.k == 1
    b = sample_batch(jax.random.PRNGKey(0), g, 0.02, 128)
    assert not np.asarray(b.ez).any()
    import jax.numpy as jnp

    ex0 = jnp.mod(b.syndrome @ g.pure_ex.T, 2.0)
    s2 = syndrome(g, ex0, jnp.zeros_like(ex0))
    np.testing.assert_array_equal(np.asarray(s2), np.asarray(b.syndrome))

    # tiny decoder end-to-end on the circuit graph
    from tpugnn.configs import ModelConfig
    from tpugnn.models import GNNDecoder

    cfg = ModelConfig(hidden=16, msg_hidden=16, rounds=2)
    model = GNNDecoder(cfg, k=g.k)
    params = model.init(jax.random.PRNGKey(1), g, b.syndrome)
    out = model.apply(params, g, b.syndrome)
    assert out.qubit_logits.shape[:2] == (128, g.n_qubits_pad)


def test_toric_circuit_graph():
    """Toric circuit-level graph: k=2, sampling/syndrome consistency."""
    g = build_circuit_code("toric", 3, 3)
    assert g.n_checks_x == 0 and g.k == 2
    b = sample_batch(jax.random.PRNGKey(0), g, 0.02, 128)
    assert not np.asarray(b.ez).any()
    import jax.numpy as jnp

    ex0 = jnp.mod(b.syndrome @ g.pure_ex.T, 2.0)
    s2 = syndrome(g, ex0, jnp.zeros_like(ex0))
    np.testing.assert_array_equal(np.asarray(s2), np.asarray(b.syndrome))


def test_unknown_family_raises():
    with pytest.raises(ValueError, match="surface.*toric"):
        build_circuit_code("steane", 3, 3)
    with pytest.raises(ValueError, match="no x-sector"):
        build_circuit_code("repetition", 3, 3, sector="x")


def test_repetition_circuit_graph():
    """Repetition circuit-level graph: k=1, sampling/syndrome consistency,
    decoder runs end-to-end."""
    g = build_circuit_code("repetition", 5, 3)
    assert g.n_checks_x == 0 and g.k == 1
    b = sample_batch(jax.random.PRNGKey(0), g, 0.02, 128)
    assert not np.asarray(b.ez).any()
    import jax.numpy as jnp

    ex0 = jnp.mod(b.syndrome @ g.pure_ex.T, 2.0)
    s2 = syndrome(g, ex0, jnp.zeros_like(ex0))
    np.testing.assert_array_equal(np.asarray(s2), np.asarray(b.syndrome))

    from tpugnn.configs import ModelConfig
    from tpugnn.models import GNNDecoder

    cfg = ModelConfig(hidden=16, msg_hidden=16, rounds=2)
    model = GNNDecoder(cfg, k=g.k)
    params = model.init(jax.random.PRNGKey(1), g, b.syndrome)
    out = model.apply(params, g, b.syndrome)
    assert out.qubit_logits.shape[:2] == (128, g.n_qubits_pad)


@pytest.mark.parametrize("family,d,d_t", [("surface", 3, 3), ("toric", 3, 2)])
def test_closed_form_matches_simulation_x_sector(family, d, d_t):
    """sector='x' swaps (own, other) schedules; the closed-form detector
    rules must match the simulator fault-by-fault in that orientation too."""
    hx, hz = CHECKS[family](d)
    x_sched, z_sched = SCHEDULES[family](d)
    n = hx.shape[1]
    m = len(x_sched)
    for prims, _ in elementary_faults(x_sched, z_sched, n, d_t):
        det_sim, x_sim = simulate_circuit(x_sched, z_sched, n, d_t, prims)
        eff = fault_effect(prims, x_sched, z_sched, n, d_t)
        sym = np.zeros(m * d_t, np.uint8)
        err = np.zeros(n, np.uint8)
        if eff is not None:
            sym[sorted(eff[0])] = 1
            err[sorted(eff[1])] = 1
        np.testing.assert_array_equal(sym, det_sim, err_msg=f"prims={prims}")
        np.testing.assert_array_equal(err, x_sim, err_msg=f"prims={prims}")


def test_x_sector_graph_pipeline():
    """sector='x' detector graph: sampling -> syndrome consistency -> decode."""
    g = build_circuit_code("surface", 3, 3, sector="x")
    gz = build_circuit_code("surface", 3, 3, sector="z")
    assert g.k == gz.k == 1
    # dual sectors of the rotated surface code have equal detector counts
    assert g.n_checks == gz.n_checks
    b = sample_batch(jax.random.PRNGKey(0), g, 0.01, 256)
    import jax.numpy as jnp

    ex0 = jnp.mod(b.syndrome @ g.pure_ex.T, 2.0)
    s2 = syndrome(g, ex0, jnp.zeros_like(ex0))
    np.testing.assert_array_equal(np.asarray(s2), np.asarray(b.syndrome))

    from tpugnn.eval.baseline import ler_bp_osd, ler_union_find

    uf = ler_union_find(g, p=0.004, shots=4096, batch=2048)
    bo = ler_bp_osd(g, p=0.004, shots=4096, batch=2048, iters=24)
    assert uf["ler"] < 0.05 and bo["ler"] < 0.05

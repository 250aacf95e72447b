"""Edge-partitioned decode == single-device decode (SURVEY.md §4.4).

Deterministic segmented sums (no atomics) make the comparison exact up to
f32 reassociation in the halo all_gather concat order; we assert a tight
allclose and identical hard decisions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpugnn.configs import CodeConfig, ExperimentConfig, ModelConfig, TrainConfig
from tpugnn.dist import build_partitioned_code, make_mesh, make_sharded_apply, make_sharded_train_step
from tpugnn.configs.config import MeshConfig
from tpugnn.models import GNNDecoder
from tpugnn.sampling import sample_batch
from tpugnn.train.loop import init_state, loss_fn


@pytest.mark.parametrize("family,d,P", [
    ("surface", 5, 4), ("toric", 3, 2),
    # BASELINE configs[5]: d=15+ edge-partitioned decoding, full mesh
    ("surface", 15, 8),
])
def test_sharded_forward_matches_single_device(family, d, P, devices8):
    graph, pg = build_partitioned_code(family, d, P)
    mesh = make_mesh(MeshConfig(data=1, graph=P), n_devices=P)
    cfg = ModelConfig(hidden=16, msg_hidden=16, rounds=3)
    model = GNNDecoder(cfg, k=graph.k)
    b = sample_batch(jax.random.PRNGKey(0), graph, 0.08, 8)
    params = model.init(jax.random.PRNGKey(1), graph, b.syndrome)

    ref = model.apply(params, graph, b.syndrome)
    sharded = make_sharded_apply(model, mesh, pg)
    got = jax.jit(sharded)(params, graph, b.syndrome)

    np.testing.assert_allclose(
        np.asarray(got.qubit_logits), np.asarray(ref.qubit_logits), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got.logical_logits), np.asarray(ref.logical_logits), atol=1e-4
    )
    # identical hard corrections
    np.testing.assert_array_equal(
        np.asarray(got.qubit_logits > 0), np.asarray(ref.qubit_logits > 0)
    )


def test_sharded_train_step_matches_single_device(devices8):
    graph, pg = build_partitioned_code("surface", 3, 2)
    mesh = make_mesh(MeshConfig(data=2, graph=2), n_devices=4)
    cfg = ExperimentConfig(
        code=CodeConfig(family="surface", distance=3, p=0.05),
        model=ModelConfig(hidden=16, msg_hidden=16, rounds=2),
        train=TrainConfig(batch=16, steps=1, warmup_steps=1),
    )
    state, model = init_state(cfg, graph)

    # single-device reference step
    from tpugnn.train.loop import make_train_step

    ref_step = make_train_step(cfg, model)
    dist_step = make_sharded_train_step(cfg, model, mesh, graph, pg)

    # both steps donate their input state buffers -> give each a real copy
    state_a = jax.tree.map(jnp.copy, state)
    state_b = jax.tree.map(jnp.copy, state)
    s_ref, m_ref = ref_step(state_a, graph)
    s_dist, m_dist = dist_step(state_b, graph)
    assert abs(float(m_ref["loss"]) - float(m_dist["loss"])) < 1e-4
    ref_leaves = jax.tree.leaves(s_ref.params)
    dist_leaves = jax.tree.leaves(s_dist.params)
    for a, b in zip(ref_leaves, dist_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.parametrize("n", [1, 2, 4, 8])
def test_dryrun_all_device_counts(n, devices8):
    from tpugnn.dist import dryrun

    dryrun(n)


def test_halo_modes_agree(devices8):
    """gather / all_to_all / ring-ppermute halo exchanges are equivalent."""
    from tpugnn.dist.partition import partition_graph
    from tpugnn.tanner import build_code

    graph = build_code("toric", 3, pad_nodes=32)
    mesh = make_mesh(MeshConfig(data=1, graph=4), n_devices=4)
    cfg = ModelConfig(hidden=16, msg_hidden=16, rounds=3)
    model = GNNDecoder(cfg, k=graph.k)
    b = sample_batch(jax.random.PRNGKey(0), graph, 0.1, 8)
    params = model.init(jax.random.PRNGKey(1), graph, b.syndrome)
    outs = []
    for halo in ("gather", "alltoall", "ring"):
        pg = partition_graph(graph, 4, halo=halo)
        apply = make_sharded_apply(model, mesh, pg)
        outs.append(jax.jit(apply)(params, graph, b.syndrome))
    for other in outs[1:]:
        np.testing.assert_allclose(
            np.asarray(outs[0].qubit_logits), np.asarray(other.qubit_logits),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(outs[0].logical_logits),
            np.asarray(other.logical_logits), atol=1e-5,
        )
    # alltoall and ring use identical send tables and must match exactly
    np.testing.assert_array_equal(
        np.asarray(outs[1].qubit_logits), np.asarray(outs[2].qubit_logits)
    )


@pytest.mark.parametrize("halo", ["gather", "alltoall", "ring"])
def test_edge_attr_parity(halo, devices8):
    """Per-edge attributes reach the message fn identically on both paths."""
    from jax.sharding import PartitionSpec as P

    from tpugnn.dist.partition import partition_graph
    from tpugnn.mp import NodeStates, bipartite_round
    from tpugnn.tanner import build_code

    graph = build_code("surface", 5, pad_nodes=32)
    pg = partition_graph(graph, 4, halo=halo)
    mesh = make_mesh(MeshConfig(data=1, graph=4), n_devices=4)
    key = jax.random.PRNGKey(0)
    kc, kq, ka = jax.random.split(key, 3)
    f = 16
    xc = jax.random.normal(kc, (graph.n_checks_pad, f)) * graph.check_mask[:, None]
    xq = jax.random.normal(kq, (graph.n_qubits_pad, f)) * graph.qubit_mask[:, None]
    attr = jax.random.normal(ka, (graph.n_edges_pad, f))

    msg = lambda xc_e, xq_e, ea: jnp.tanh(xc_e + 2.0 * xq_e) * ea
    upd = lambda old, agg: old + agg

    ref = bipartite_round(
        graph, NodeStates(xc, xq),
        message_to_qubit=msg, message_to_check=msg,
        update_check=upd, update_qubit=upd, edge_attr=attr,
    )

    def inner(pg_, xc_, xq_, attr_):
        out = bipartite_round(
            pg_.local(), NodeStates(xc_, xq_),
            message_to_qubit=msg, message_to_check=msg,
            update_check=upd, update_qubit=upd, edge_attr=attr_,
        )
        return out.check, out.qubit

    smap = jax.shard_map(
        inner, mesh=mesh, axis_names={"graph"},
        in_specs=(P("graph"), P("graph"), P("graph"), P()),
        out_specs=(P("graph"), P("graph")),
    )
    got_c, got_q = jax.jit(smap)(pg, xc, xq, attr)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(ref.check), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_q), np.asarray(ref.qubit), atol=1e-5)

"""MP engine: oracle parity, backend equivalence, masking invariance, grads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.oracle.mp_oracle import gather_oracle, scatter_agg_oracle
from tpugnn.mp import (
    NodeStates,
    aggregate_to_checks,
    aggregate_to_qubits,
    bipartite_round,
    gather_endpoints,
    propagate,
)
from tpugnn.tanner import build_code

BACKENDS = ["segment", "dense", "ell"]


def _rand_states(g, B=4, F=16, seed=0):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    xc = jax.random.normal(k1, (B, g.n_checks_pad, F))
    xq = jax.random.normal(k2, (B, g.n_qubits_pad, F))
    msg = jax.random.normal(k3, (B, g.n_edges_pad, F))
    return xc, xq, msg


@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.parametrize("family,d", [("surface", 3), ("toric", 3), ("repetition", 5)])
def test_gather_matches_oracle(backend, family, d):
    g = build_code(family, d)
    xc, xq, _ = _rand_states(g)
    got_c, got_q = gather_endpoints(g, xc, xq, backend=backend)
    ref_c, ref_q = gather_oracle(
        np.asarray(g.edge_check), np.asarray(g.edge_qubit), np.asarray(g.edge_mask),
        np.asarray(xc), np.asarray(xq),
    )
    np.testing.assert_allclose(np.asarray(got_c), ref_c, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_q), ref_q, atol=1e-5)


@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.parametrize("agg", ["sum", "mean", "max"])
def test_aggregate_matches_oracle(backend, agg):
    if backend == "dense" and agg == "max":
        pytest.skip("dense backend routes max to segment path")
    g = build_code("surface", 3)
    _, _, msg = _rand_states(g)
    got = aggregate_to_checks(g, msg, backend=backend, agg=agg)
    ref = scatter_agg_oracle(
        np.asarray(msg), np.asarray(g.edge_check), np.asarray(g.edge_mask),
        g.n_checks_pad, agg,
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)
    got_q = aggregate_to_qubits(g, msg, backend=backend, agg=agg)
    ref_q = scatter_agg_oracle(
        np.asarray(msg), np.asarray(g.edge_qubit), np.asarray(g.edge_mask),
        g.n_qubits_pad, agg,
    )
    np.testing.assert_allclose(np.asarray(got_q), ref_q, atol=1e-5)


def test_backend_equivalence():
    """segment and dense backends agree on a full bipartite round."""
    g = build_code("surface", 5)
    xc, xq, _ = _rand_states(g, B=3, F=8)

    def mk(backend):
        return bipartite_round(
            g, NodeStates(check=xc, qubit=xq),
            message_to_qubit=lambda c, q, _: jnp.tanh(c) * q,
            message_to_check=lambda c, q, _: c + 0.5 * q,
            update_check=lambda x, a: x + a,
            update_qubit=lambda x, a: x - a,
            backend=backend,
        )

    a, b = mk("segment"), mk("dense")
    np.testing.assert_allclose(np.asarray(a.check), np.asarray(b.check), atol=1e-4)
    np.testing.assert_allclose(np.asarray(a.qubit), np.asarray(b.qubit), atol=1e-4)


@pytest.mark.parametrize("backend", BACKENDS)
def test_masking_invariance(backend):
    """Growing the edge/node padding never changes real-row outputs."""
    g1 = build_code("surface", 3, pad_nodes=8, pad_edges=128)
    g2 = build_code("surface", 3, pad_nodes=16, pad_edges=512)
    B, F = 2, 8
    key = jax.random.PRNGKey(0)
    xc = jax.random.normal(key, (B, g1.n_checks_pad, F))
    xq = jax.random.normal(jax.random.PRNGKey(1), (B, g1.n_qubits_pad, F))
    xc2 = jnp.zeros((B, g2.n_checks_pad, F)).at[:, : g1.n_checks_pad].set(xc)
    xq2 = jnp.zeros((B, g2.n_qubits_pad, F)).at[:, : g1.n_qubits_pad].set(xq)

    def run(g, xc, xq):
        return propagate(
            g, xc, xq,
            lambda c, q, _: c * jnp.cos(q),
            to="check", backend=backend,
        )

    o1 = np.asarray(run(g1, xc, xq))[:, : g1.n_checks]
    o2 = np.asarray(run(g2, xc2, xq2))[:, : g2.n_checks]
    np.testing.assert_allclose(o1, o2, atol=1e-5)


@pytest.mark.parametrize("backend", BACKENDS)
def test_gradients(backend):
    """check_grads through gather + message + aggregate."""
    from jax.test_util import check_grads

    g = build_code("repetition", 4)
    xc, xq, _ = _rand_states(g, B=2, F=4)

    def f(xc, xq):
        out = propagate(
            g, xc, xq,
            lambda c, q, _: jnp.tanh(c + q),
            to="qubit", backend=backend,
        )
        return jnp.sum(out**2)

    check_grads(f, (xc, xq), order=1, modes=["rev"], atol=1e-2, rtol=1e-2)


def test_update_fn_applied():
    g = build_code("repetition", 4)
    xc, xq, _ = _rand_states(g, B=2, F=4)
    base = propagate(g, xc, xq, lambda c, q, _: c + q, to="check")
    with_upd = propagate(
        g, xc, xq, lambda c, q, _: c + q, to="check",
        update_fn=lambda old, agg: old + 2.0 * agg,
    )
    np.testing.assert_allclose(
        np.asarray(with_upd), np.asarray(xc + 2.0 * base), atol=1e-5
    )


class TestMessagePassingAdapter:
    """PyG-style class API maps exactly onto the functional engine."""

    def _setup(self):
        import jax

        graph = build_code("surface", 3)
        key = jax.random.PRNGKey(0)
        kc, kq = jax.random.split(key)
        f = 8
        xc = jax.random.normal(kc, (graph.n_checks_pad, f)) * graph.check_mask[:, None]
        xq = jax.random.normal(kq, (graph.n_qubits_pad, f)) * graph.qubit_mask[:, None]
        return graph, xc, xq

    def test_matches_functional_propagate(self):
        import jax.numpy as jnp
        import numpy as np

        from tpugnn.mp import MessagePassing, propagate

        graph, xc, xq = self._setup()

        class L(MessagePassing):
            def message(self, x_i, x_j, edge_attr):
                return jnp.tanh(x_i + 2.0 * x_j)

            def update(self, aggr_out, x):
                return x + aggr_out

        got = L(aggr="sum", flow="qubit->check")(graph, xc, xq)
        # functional twin: for to='check', dst endpoint is the check
        want = propagate(
            graph, xc, xq,
            lambda xc_e, xq_e, ea: jnp.tanh(xc_e + 2.0 * xq_e),
            to="check", aggr="sum", update_fn=lambda old, agg: old + agg,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    def test_flow_direction_and_defaults(self):
        import numpy as np

        from tpugnn.mp import MessagePassing, propagate

        graph, xc, xq = self._setup()
        got = MessagePassing(flow="check->qubit")(graph, xc, xq)
        want = propagate(graph, xc, xq,
                         lambda xc_e, xq_e, ea: xc_e,  # x_j = source = check
                         to="qubit", aggr="sum")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
        assert got.shape == xq.shape

    def test_bad_args_raise(self):
        import pytest

        from tpugnn.mp import MessagePassing

        with pytest.raises(ValueError, match="aggr"):
            MessagePassing(aggr="median")
        with pytest.raises(ValueError, match="flow"):
            MessagePassing(flow="sideways")

"""Sliding-window streaming decoder (tpugnn.streaming)."""

import numpy as np
import pytest

from tpugnn.streaming import SlidingWindowDecoder, sample_stream, stream_ler


def test_zero_stream_zero_correction():
    dec = SlidingWindowDecoder.from_union_find(
        "repetition", 5, window=4, commit=2)
    s = np.zeros((3, 8, dec.m), np.uint8)
    e = dec.decode_stream(s)
    assert e.shape == (3, dec.n)
    assert not e.any()


def test_single_data_fault_corrected_exactly():
    """One isolated data fault anywhere in the stream: union-find windows
    recover it exactly (repetition-code streams are matchable and a single
    fault is within every decoder's guarantee)."""
    d = 5
    dec = SlidingWindowDecoder.from_union_find(
        "repetition", d, window=4, commit=2)
    h = dec.h
    t_rounds = 10
    for tau in (0, 3, 6, 9):
        for q in range(d):
            e = np.zeros((1, t_rounds, d), np.uint8)
            e[0, tau, q] = 1
            cum = np.bitwise_xor.accumulate(e, axis=1)
            s_hat = (cum @ h.T % 2).astype(np.uint8)
            e_hat = dec.decode_stream(s_hat)
            res = (cum[:, -1] ^ e_hat)
            # residual must be syndrome-free and logical-free; for a single
            # fault UF finds it exactly (possibly up to a stabilizer, which
            # for the repetition code means exact)
            assert not ((res @ h.T) % 2).any(), (tau, q)
            assert not res.any(), (tau, q)


def test_single_measurement_fault_no_logical_damage():
    """An isolated measurement fault fires detectors (c, tau), (c, tau+1);
    the decoder must not be tricked into a logical error by it."""
    d = 5
    dec = SlidingWindowDecoder.from_union_find(
        "repetition", d, window=4, commit=2)
    h = dec.h
    m = h.shape[0]
    t_rounds = 8
    for tau in (0, 2, 5):
        for c in range(m):
            s_hat = np.zeros((1, t_rounds, m), np.uint8)
            s_hat[0, tau, c] = 1  # flipped measurement at round tau
            e_hat = dec.decode_stream(s_hat)
            res = e_hat[0]  # true net error is zero
            assert not ((res @ h.T) % 2).any(), (tau, c)
            # no logical-weight correction invented from one flipped bit
            assert res.sum() < d, (tau, c)


def test_stream_requires_tiling():
    dec = SlidingWindowDecoder.from_union_find(
        "repetition", 3, window=4, commit=2)
    with pytest.raises(ValueError, match="window"):
        dec.decode_stream(np.zeros((1, 5, dec.m), np.uint8))  # (5-4) % 2 != 0


def test_streaming_ler_tracks_monolithic():
    """Streaming union-find at small p performs close to the monolithic
    whole-stream decode and far better than no decoding."""
    d, t_rounds, shots, p = 5, 8, 400, 0.03
    stream_dec = SlidingWindowDecoder.from_union_find(
        "repetition", d, window=4, commit=2)
    mono_dec = SlidingWindowDecoder.from_union_find(
        "repetition", d, window=t_rounds, commit=t_rounds)
    ler_s = stream_ler(stream_dec, p=p, rounds=t_rounds, shots=shots, seed=3)
    ler_m = stream_ler(mono_dec, p=p, rounds=t_rounds, shots=shots, seed=3)

    # no-decode failure rate: any nonzero net error or syndrome
    rng = np.random.default_rng(3)
    s_hat, e_net = sample_stream(rng, "repetition", d, p=p, rounds=t_rounds,
                                 batch=shots)
    no_decode = float(np.logical_or(
        (e_net @ stream_dec.h.T % 2).any(axis=1),
        (e_net @ _logical(stream_dec).T % 2).any(axis=1)).mean())

    assert ler_s["ler"] < no_decode * 0.5
    # within statistical reach of monolithic decoding (same seed stream)
    assert ler_s["ler"] <= ler_m["ler"] + 3 * (ler_m["ler_stderr"] + 0.02)


def _logical(dec):
    from tpugnn.tanner import repetition
    from tpugnn.utils import f2

    hx, hz = (np.asarray(x, np.uint8) for x in repetition.repetition_code_checks(dec.distance))
    lx, lz = f2.css_logicals(hx, hz)
    return lz if dec.sector == "z" else lx


def test_gnn_adapter_plumbing():
    """The GNN window adapter produces shaped, deterministic corrections."""
    import jax

    from tpugnn.configs import ModelConfig
    from tpugnn.models import GNNDecoder

    dec0 = SlidingWindowDecoder.from_union_find(
        "repetition", 3, window=3, commit=1)
    cfg = ModelConfig(hidden=8, msg_hidden=8, rounds=2, backend="segment",
                      readout="per_qubit")
    model = GNNDecoder(cfg, k=dec0.graph.k)
    params = model.init(jax.random.PRNGKey(0), dec0.graph,
                        np.zeros((2, dec0.graph.n_checks_pad), np.float32))
    dec = SlidingWindowDecoder.from_gnn(
        "repetition", 3, window=3, commit=1,
        apply_fn=model.apply, params=params)
    s_hat, _ = sample_stream(np.random.default_rng(0), "repetition", 3,
                             p=0.1, rounds=5, batch=4)
    e1 = dec.decode_stream(s_hat)
    e2 = dec.decode_stream(s_hat)
    assert e1.shape == (4, 3)
    np.testing.assert_array_equal(e1, e2)


def test_mwpm_window_decoder():
    """Exact-MWPM windows: single faults recovered, streaming LER at least
    as good as union-find windows on the identical stream."""
    dec = SlidingWindowDecoder.from_mwpm("repetition", 5, window=4, commit=2)
    h = dec.h
    for tau, q in ((0, 2), (5, 0), (9, 4)):
        e = np.zeros((1, 10, 5), np.uint8)
        e[0, tau, q] = 1
        cum = np.bitwise_xor.accumulate(e, axis=1)
        s_hat = (cum @ h.T % 2).astype(np.uint8)
        res = cum[:, -1] ^ dec.decode_stream(s_hat)
        assert not res.any(), (tau, q)
    mw = stream_ler(dec, p=0.04, rounds=8, shots=400, seed=3)
    uf = stream_ler(
        SlidingWindowDecoder.from_union_find("repetition", 5, window=4,
                                             commit=2),
        p=0.04, rounds=8, shots=400, seed=3)
    assert mw["ler"] <= uf["ler"] + 3 * uf["ler_stderr"]


def test_gnn_cleanup_adapter_closed_gate_equals_uf():
    """from_gnn_cleanup with the confidence gate closed (tau > 1) commits
    exactly the union-find window corrections — streams must match."""
    import jax

    from tpugnn.configs import ModelConfig
    from tpugnn.models import GNNDecoder

    dec_uf = SlidingWindowDecoder.from_union_find(
        "repetition", 3, window=3, commit=1)
    cfg = ModelConfig(hidden=8, msg_hidden=8, rounds=2, backend="segment",
                      readout="per_qubit")
    model = GNNDecoder(cfg, k=dec_uf.graph.k)
    params = model.init(jax.random.PRNGKey(0), dec_uf.graph,
                        np.zeros((2, dec_uf.graph.n_checks_pad), np.float32))
    dec = SlidingWindowDecoder.from_gnn_cleanup(
        "repetition", 3, window=3, commit=1,
        apply_fn=model.apply, params=params, tau=1.5)
    s_hat, _ = sample_stream(np.random.default_rng(1), "repetition", 3,
                             p=0.1, rounds=5, batch=8)
    np.testing.assert_array_equal(
        dec.decode_stream(s_hat), dec_uf.decode_stream(s_hat))


def test_gnn_cleanup_stream_is_syndrome_consistent():
    """Even an untrained GNN's cleanup-hybrid windows commit corrections
    whose net residual is syndrome-free on fault-free final rounds."""
    import jax

    from tpugnn.configs import ModelConfig
    from tpugnn.models import GNNDecoder
    from tpugnn.streaming import stream_ler

    dec0 = SlidingWindowDecoder.from_union_find(
        "repetition", 5, window=3, commit=1)
    cfg = ModelConfig(hidden=8, msg_hidden=8, rounds=2, backend="segment",
                      readout="per_qubit")
    model = GNNDecoder(cfg, k=dec0.graph.k)
    params = model.init(jax.random.PRNGKey(2), dec0.graph,
                        np.zeros((2, dec0.graph.n_checks_pad), np.float32))
    dec = SlidingWindowDecoder.from_gnn_cleanup(
        "repetition", 5, window=3, commit=1,
        apply_fn=model.apply, params=params)
    h = dec.h
    s_hat, e_net = sample_stream(np.random.default_rng(3), "repetition", 5,
                                 p=0.05, rounds=7, batch=32)
    res = e_net ^ dec.decode_stream(s_hat)
    # every committed window was cleaned to consistency, so the net
    # correction reproduces the final (perfect-round) syndrome exactly
    assert not ((res @ h.T) % 2).any()

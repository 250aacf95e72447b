"""Utils: roofline model, metric logger, timer."""

import json
import os

from benchmarks.roofline import fused_decode_cost
from tpugnn.utils.metrics import MetricLogger, Timer


def test_roofline_bounds():
    c = fused_decode_cost(batch=4096, m_pad=128, n_pad=128, deg_c=4, deg_q=4,
                          hidden=128, msg_hidden=128, rounds=8)
    assert c.flops > 0 and c.hbm_bytes > 0
    assert c.t_sol == max(c.t_flops, c.t_hbm)
    # %SoL of a measurement slower than SoL is < 100
    assert c.pct_sol(c.t_sol * 2) == 50.0


def test_metric_logger_jsonl(tmp_path):
    path = os.path.join(str(tmp_path), "x.jsonl")
    ml = MetricLogger(path, stdout=False)
    ml.log({"step": 1, "loss": 0.5})
    ml("legacy string call")
    ml.close()
    rec = json.loads(open(path).read().splitlines()[0])
    assert rec["loss"] == 0.5 and "time" in rec


def test_timer():
    import jax.numpy as jnp

    t = Timer.time_fn(lambda x: x + 1, jnp.ones((4,)), iters=2, warmup=1)
    assert t >= 0.0

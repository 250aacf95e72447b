"""Device synchronization that actually blocks through the axon relay.

Observed 2026-08-19 on the tunneled TPU: ``jax.block_until_ready`` returns
in ~0.3 ms on a matmul whose true device time is ~9 ms (and whose
``device_get`` correctly takes ~37 ms incl. the relay's completion-poll
backoff).  Every timing/warmup path must therefore sync by *fetching* one
element of the last output: the fetch is queued after all previously
dispatched work on the device (TPU cores execute programs in dispatch
order), so it is a full barrier, and ``device_get`` does wait for its
buffer.  On a directly-attached device this costs one tiny D2H transfer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["hard_sync"]


def hard_sync(out):
    """Block until all dispatched work ordered before ``out`` is complete.

    ``out`` may be any pytree of jax arrays; returns the fetched scalar so
    callers can fold it into a dependency if they want.
    """
    leaves = jax.tree_util.tree_leaves(out)
    if not leaves:
        return None
    leaf = leaves[0]
    if not isinstance(leaf, jax.Array):
        return leaf
    return jax.device_get(jnp.ravel(leaf)[:1])

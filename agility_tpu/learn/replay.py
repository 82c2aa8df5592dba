"""Fixed-capacity device ring buffer for discriminator policy transitions
(replaces bbc/rsl_rl/storage/replay_buffer.py: 1M slots of
(disc_obs_len*49 features, eps, c))."""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Ring(NamedTuple):
    data: jnp.ndarray      # (cap, D)
    cursor: jnp.ndarray    # () int32
    size: jnp.ndarray      # () int32

    @property
    def capacity(self) -> int:
        return self.data.shape[0]


def init(capacity: int, dim: int, dtype=jnp.float32) -> Ring:
    return Ring(
        data=jnp.zeros((capacity, dim), dtype),
        cursor=jnp.zeros((), jnp.int32),
        size=jnp.zeros((), jnp.int32),
    )


def insert(ring: Ring, rows: jnp.ndarray) -> Ring:
    """Insert a contiguous block of rows (capacity must be a multiple of the
    block size so wrap-around stays a single dynamic slice)."""
    n = rows.shape[0]
    assert ring.capacity % n == 0, "ring capacity must be a multiple of insert size"
    data = jax.lax.dynamic_update_slice(ring.data, rows, (ring.cursor, jnp.int32(0)))
    cursor = (ring.cursor + n) % ring.capacity
    size = jnp.minimum(ring.size + n, ring.capacity)
    return Ring(data=data, cursor=cursor, size=size)


def sample(ring: Ring, key, n: int) -> jnp.ndarray:
    idx = jax.random.randint(key, (n,), 0, jnp.maximum(ring.size, 1))
    return ring.data[idx]

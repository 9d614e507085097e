"""Small utility parity with the reference's utils/cuda_utility.*.

- ``device_clamp``        <- branchless clamp (cuda_utility.cu:50-56)
- ``degrees_to_radians``  <- cuda_utility.cuh:40-43
- ``random_permutation``  <- Fisher-Yates (cuda_utility.cu:58-73; unused by
  the reference kernel but part of its utility surface). The jax version is
  the standard counter-based shuffle.
- ``random_int``          <- cuda_random_int with the reference's
  inclusive-range semantics (cuda_utility.cu:44-48 draws from (min, max]
  due to its ceil of a (0,1] uniform; we expose the intended [min, max]).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def device_clamp(x: jnp.ndarray, lo, hi) -> jnp.ndarray:
    """Branchless clamp (the VPU emits min/max exactly like the reference's
    arithmetic trick compiles to on GPU)."""
    return jnp.minimum(jnp.maximum(x, lo), hi)


def degrees_to_radians(deg: float) -> float:
    return deg * (math.pi / 180.0)


def random_permutation(key: jax.Array, n: int) -> jnp.ndarray:
    """Uniform random permutation of [0, n)."""
    return jax.random.permutation(key, n)


def random_int(key: jax.Array, shape, minval: int, maxval: int) -> jnp.ndarray:
    """Uniform integers in [minval, maxval]."""
    return jax.random.randint(key, shape, minval, maxval + 1)

"""Three-term Sellmeier dispersion, batched and differentiable.

Reference: refraction/sellmeier.cu:12-23. Wavelengths arrive in nm and are
converted to micrometers inside; coefficients are differentiable so the
inverse-rendering path can recover B/C from images.
"""

from __future__ import annotations

import jax.numpy as jnp


def sellmeier_index(b: jnp.ndarray, c: jnp.ndarray, lambda_nm: jnp.ndarray) -> jnp.ndarray:
    """Refractive index n(lambda) from 3-term Sellmeier coefficients.

    b, c: [..., 3]; lambda_nm broadcasts against b[..., 0]. Returns n with
    the broadcast shape. Matches reference refraction/sellmeier.cu:12-23.
    """
    lam_um = lambda_nm * 1e-3
    l2 = (lam_um * lam_um)[..., None]
    n2 = 1.0 + jnp.sum(b * l2 / (l2 - c), axis=-1)
    # guard: near Sellmeier poles n2 can go negative in f32; clamp like a
    # physical lower bound rather than produce NaN (the reference would NaN)
    return jnp.sqrt(jnp.maximum(n2, 1e-6))

"""Shared helpers for the Pallas kernel modules.

One definition each of the backend check, tile rounding, the quick-gelu
exp2 constant, and the f32 LayerNorm that every kernel module previously
re-implemented (quant_matmul, flash_attention, bf16_layer, bf16_mlp_grad)
— a fix to any of these must land exactly once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# quick_gelu(g) = g·sigmoid(1.702 g) in exp2 form (TPU's native
# transcendental is exp2; exp costs an extra multiply per element):
# sigmoid(1.702 g) = 1 / (1 + exp2(NEG_1702_LOG2E · g))
NEG_1702_LOG2E = float(-1.702 * np.log2(np.e))


def on_tpu() -> bool:
    """True when the default backend is a real TPU (Pallas kernels compile
    natively); CPU callers fall back to XLA twins or interpret mode."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def layernorm_f32(x: jax.Array, scale: jax.Array, bias: jax.Array,
                  eps: float = 1e-5) -> jax.Array:
    """LayerNorm computed in the caller's dtype (pass f32 in kernels —
    bf16 mean/variance loses ~2 decimal digits on the residual stream)."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias

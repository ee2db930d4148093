"""Elementwise layer primitives: norms and activations.

Counterpart of the reference's ``csrc/layernorm_kernels.cu`` (rms_norm,
fused_add_rms_norm) and ``csrc/activation_kernels.cu`` (silu_and_mul).
On TPU these are pure jnp — XLA fuses them into adjacent matmuls, which is
exactly what the hand-written CUDA kernels exist to do.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    """RMSNorm in f32 accumulation (reference: rms_norm kernel)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps)
    return (out * weight.astype(jnp.float32)).astype(x.dtype)


def fused_add_rms_norm(
    x: jax.Array, residual: jax.Array, weight: jax.Array, eps: float = 1e-6
) -> Tuple[jax.Array, jax.Array]:
    """residual += x; return (rms_norm(residual), residual).

    Mirrors the reference's fused_add_rms_norm: the residual stream is
    updated in f32-accumulated addition, then normalized.
    """
    new_residual = (x.astype(jnp.float32) +
                    residual.astype(jnp.float32)).astype(x.dtype)
    return rms_norm(new_residual, weight, eps), new_residual


def layer_norm(x: jax.Array, weight: jax.Array,
               bias: Optional[jax.Array] = None,
               eps: float = 1e-5, plus_one: bool = False) -> jax.Array:
    """Classic LayerNorm in f32 (GPT-2/Starcoder2/StableLM families).
    plus_one selects Nemotron's LayerNorm1P (zero-centered weight + 1)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    w = weight.astype(jnp.float32)
    if plus_one:
        w = w + 1.0
    out = out * w
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def silu_and_mul(gate_up: jax.Array) -> jax.Array:
    """SwiGLU activation over a concatenated [.., 2*I] gate/up projection
    (reference: silu_and_mul kernel)."""
    gate, up = jnp.split(gate_up, 2, axis=-1)
    return jax.nn.silu(gate.astype(jnp.float32)).astype(gate.dtype) * up


def gelu_and_mul(gate_up: jax.Array) -> jax.Array:
    gate, up = jnp.split(gate_up, 2, axis=-1)
    return jax.nn.gelu(gate.astype(jnp.float32),
                       approximate=True).astype(gate.dtype) * up


def swiglu_oai_and_mul(gate_up: jax.Array, *, alpha: float = 1.702,
                       limit: float = 7.0) -> jax.Array:
    """gpt-oss clamped SwiGLU (reference numerics: HF GptOssExperts.forward —
    gate clamped to ≤limit, up to ±limit, glu = gate·σ(α·gate),
    out = (up + 1)·glu)."""
    gate, up = jnp.split(gate_up, 2, axis=-1)
    gate = jnp.minimum(gate.astype(jnp.float32), limit)
    up = jnp.clip(up.astype(jnp.float32), -limit, limit)
    glu = gate * jax.nn.sigmoid(alpha * gate)
    return ((up + 1.0) * glu).astype(gate_up.dtype)


ACTIVATIONS = {
    "silu": silu_and_mul,
    "gelu": gelu_and_mul,
    "geglu": gelu_and_mul,
    "swiglu_oai": swiglu_oai_and_mul,
}

# Non-gated MLP activations (mlp_gated=False families).
ACTIVATIONS_SINGLE = {
    "gelu_only": lambda x: jax.nn.gelu(
        x.astype(jnp.float32), approximate=True).astype(x.dtype),
    "relu2": lambda x: jnp.square(
        jax.nn.relu(x.astype(jnp.float32))).astype(x.dtype),
    "gelu_exact": lambda x: jax.nn.gelu(
        x.astype(jnp.float32), approximate=False).astype(x.dtype),
    "relu": lambda x: jax.nn.relu(x.astype(jnp.float32)).astype(x.dtype),
    "silu_only": lambda x: jax.nn.silu(
        x.astype(jnp.float32)).astype(x.dtype),
}

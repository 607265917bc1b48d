"""Building blocks of the point backbone.

Layout convention: (B, N, C) — channels last, so C rides the TPU lane
dimension and pointwise "Conv1d(kernel=1)" layers become plain Dense
matmuls on the MXU.

Parity targets in the reference:
  * ConvBN          — the Conv1d+BatchNorm1d+LeakyReLU(0.2) stacks
                      (models/model.py:506-529).
  * SALayer         — PCT-style offset attention with tied Q/K weights and
                      double-normalised N x N attention
                      (models/model.py:97-123).
  * N2PAttention    — 4-head neighbor-to-point attention over the k-NN graph
                      of the *current feature space*, neighbor-difference
                      keys/values, +FFN, two BatchNorm residuals
                      (models/model.py:325-395; covers both the 64-channel
                      and the 128-channel `_DIM` variant via `dim`).

Weight init follows torch's Conv/Linear default (Kaiming-uniform with
a=sqrt(5), i.e. U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for kernels and biases)
so training dynamics track the reference statistically.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from dvmatcher_tpu.ops.geometry import BIG

Dtype = jnp.dtype


def torch_kernel_init(key, shape, dtype=jnp.float32):
    """U(-b, b) with b = 1/sqrt(fan_in) — torch nn.Linear/Conv default."""
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in: int) -> Callable:
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TorchDense(nn.Module):
    """Dense with torch-default init (kernel stored (in, out)).

    `dtype` is the flax compute dtype: params stay f32, the matmul runs in
    `dtype` (bf16 = one MXU pass instead of the f32 multi-pass)."""

    features: int
    use_bias: bool = True
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(x.shape[-1]),
        )(x)


class BatchNorm(nn.Module):
    """BatchNorm over all axes but the last (torch BatchNorm1d semantics on
    a (B, C, N) tensor == flax default on (B, N, C))."""

    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
        )(x)


class ConvBN(nn.Module):
    """Pointwise conv (no bias) + BN + LeakyReLU(0.2)."""

    features: int
    negative_slope: float = 0.2
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = TorchDense(self.features, use_bias=False, dtype=self.dtype)(x)
        x = BatchNorm(dtype=self.dtype)(x, train)
        return nn.leaky_relu(x, self.negative_slope)


class SALayer(nn.Module):
    """Offset attention (models/model.py:97-123).

    Q and K share one weight matrix (the reference ties them at :106), so
    the energy is the Gram matrix of the projected features. The attention
    is softmax over the last axis then renormalised by column sums, and the
    residual is computed on the *offset* x - x_r.
    """

    channels: int
    use_kernel: bool = False
    dtype: Dtype | None = None
    # Point-axis sharding: name of the mesh axis the point dimension is
    # sharded over (requires running inside shard_map; mask unsupported).
    # See parallel/sharded_attention.py.
    shard_axis: str | None = None

    @nn.compact
    def __call__(self, x, train: bool, mask: jax.Array | None = None):
        from dvmatcher_tpu.ops.pallas.sa_attention import (
            sa_attention_ad,
            sa_attention_xla,
        )

        c = self.channels
        q = TorchDense(c // 4, use_bias=False, dtype=self.dtype)(x)
        v = TorchDense(c, use_bias=True, dtype=self.dtype)(x)

        if self.shard_axis is not None:
            from dvmatcher_tpu.parallel.sharded_attention import (
                sharded_sa_attention,
            )

            x_r = sharded_sa_attention(
                q.astype(jnp.float32), v.astype(jnp.float32),
                self.shard_axis, mask, use_kernel=self.use_kernel,
            )
        elif self.use_kernel:
            # the fused kernel's buffers are f32 (it downcasts to bf16 on
            # the MXU internally); cast at the boundary under mixed precision
            f32 = jnp.float32
            x_r = sa_attention_ad(q.astype(f32), v.astype(f32), mask, "fast")
        else:
            x_r = sa_attention_xla(
                q.astype(jnp.float32), v.astype(jnp.float32), mask
            )
        offset = TorchDense(c, use_bias=True, dtype=self.dtype)(
            x - x_r.astype(x.dtype)
        )
        offset = nn.relu(BatchNorm(dtype=self.dtype)(offset, train))
        return x + offset


class N2PAttention(nn.Module):
    """Neighbor-to-point attention (models/model.py:325-395).

    k-NN graph built in the *current* feature space each call; keys/values
    are neighbor-difference features; 4 heads; FFN expansion x4; two
    post-residual BatchNorms.

    The difference keys/values are linear, so projections happen BEFORE
    neighbor selection (k(x_j - x_i) = Kx_j - Kx_i) — 40x fewer projection
    FLOPs than the reference's project-after-gather, with identical math.
    `use_kernel=True` swaps in the fused Pallas kernel (ops.pallas), which
    streams distance + selection + attention through VMEM with zero
    gathers; the XLA path remains the autodiff/CPU implementation.
    """

    dim: int
    k: int
    heads: int = 4
    use_kernel: bool = False
    dtype: Dtype | None = None
    # Point-axis sharding (see SALayer.shard_axis).
    shard_axis: str | None = None

    @nn.compact
    def __call__(self, x, train: bool, mask: jax.Array | None = None):
        from dvmatcher_tpu.ops.pallas.knn_attention import (
            knn_attention_ad,
            knn_attention_xla,
        )

        b, n, c = x.shape
        assert c == self.dim

        q = TorchDense(c, use_bias=False, dtype=self.dtype)(x)
        k_ = TorchDense(c, use_bias=False, dtype=self.dtype)(x)
        v = TorchDense(c, use_bias=False, dtype=self.dtype)(x)

        if self.shard_axis is not None:
            from dvmatcher_tpu.parallel.sharded_attention import (
                sharded_knn_attention,
            )

            f32 = jnp.float32
            out = sharded_knn_attention(
                x.astype(f32), q.astype(f32), k_.astype(f32), v.astype(f32),
                self.k, self.heads, self.shard_axis, mask,
                use_kernel=self.use_kernel,
            )
        elif self.use_kernel:
            f32 = jnp.float32
            out = knn_attention_ad(
                x.astype(f32), q.astype(f32), k_.astype(f32), v.astype(f32),
                mask, self.k, self.heads, "fast",
            )
        else:
            f32 = jnp.float32
            out = knn_attention_xla(
                x.astype(f32), q.astype(f32), k_.astype(f32), v.astype(f32),
                mask, knn_k=self.k, heads=self.heads,
            )

        x = BatchNorm(dtype=self.dtype)(x + out.astype(x.dtype), train)
        ff = TorchDense(c * 4, use_bias=False, dtype=self.dtype)(x)
        ff = nn.leaky_relu(ff, 0.2)
        ff = TorchDense(c, use_bias=False, dtype=self.dtype)(ff)
        return BatchNorm(dtype=self.dtype)(x + ff, train)


class MLP(nn.Module):
    """ELU MLP, no activation after the final layer (models/model.py:433-452)."""

    features: tuple[int, ...]
    out: int

    @nn.compact
    def __call__(self, x):
        for f in self.features:
            x = TorchDense(f)(x)
            x = nn.elu(x)
        return TorchDense(self.out)(x)

"""Single-pass NHWC GroupNorm that XLA fuses around, for the SDXL stack.

`flax.linen.GroupNorm` applied to an f32 upcast (the obvious transcription
of diffusers' GroupNorm numerics, torch.nn.GroupNorm) materializes a full
float32 copy of the activation and walks it in separate mean/var/normalize
passes. At SDXL-1024 resnet geometries those normalization passes are the
dominant glue between convolutions — measured 0.44 ms per conv at
128x128x320 versus a ~0.09 ms bandwidth roofline, while the convs
themselves run near the MXU rate and SiLU fuses into the conv input for
free (benchmarks/probe_resnet_glue.py).

This implementation never materializes an upcast copy:

- statistics: sum and sum-of-squares in ONE fused reduction pass over the
  native-dtype input (f32 accumulation; XLA fuses sibling reductions and
  the squaring producer into a single memory walk);
- normalization: folded to a per-(batch, channel) affine ``y = x*a + b``
  with f32 scalars — a pure elementwise consumer that XLA input-fuses
  into the following convolution exactly like the SiLU.

Param names/shapes match ``nn.GroupNorm`` (``scale``/``bias`` of shape
(C,)), so checkpoints and the torch converters are unaffected.

Numerics note: variance uses E[x^2] - E[x]^2 with f32 accumulation (vs
the two-pass E[(x-mean)^2]); on normalization-scale activations the
difference is ~1e-7 relative, far below the bf16 noise floor the SDXL
stack runs at. Golden-tested against torch.nn.GroupNorm in
tests/test_sdxl_parity.py.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class FastGroupNorm(nn.Module):
    num_groups: int
    epsilon: float = 1e-5
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        g = self.num_groups
        assert c % g == 0, (c, g)
        cg = c // g
        scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)

        xg = x.reshape(x.shape[0], -1, g, cg)
        n = xg.shape[1] * cg
        s1 = jnp.sum(xg, axis=(1, 3), dtype=jnp.float32)
        s2 = jnp.sum(jnp.square(xg.astype(jnp.float32)), axis=(1, 3))
        mean = s1 / n
        var = jnp.maximum(s2 / n - mean * mean, 0.0)
        inv = jax.lax.rsqrt(var + self.epsilon)  # (B, G) f32

        gamma = scale.astype(jnp.float32).reshape(g, cg)
        beta = bias.astype(jnp.float32).reshape(g, cg)
        a = inv[..., None] * gamma  # (B, G, cg)
        b = beta - mean[..., None] * a
        # native-dtype x times f32 scalars: promotes elementwise, fuses
        # into the consumer; no f32 copy ever lands in HBM
        y = xg * a[:, None] + b[:, None]
        return y.reshape(x.shape).astype(x.dtype)

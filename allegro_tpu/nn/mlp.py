"""Scalar MLPs with forward-variance-preserving initialization.

Fills the role of nequip's ``ScalarMLP`` / ``ScalarMLPFunction`` consumed at
reference ``allegro/nn/_allegro.py:33,90-94`` and
``allegro/model/allegro_models.py:173-183``: bias-free linear layers whose
weights are drawn ``N(0, 1/fan_in)`` so activations keep unit variance at init
("forward_weight_init"), SiLU nonlinearity between hidden layers, and an
``is_nonlinear``-style contract (a single-layer MLP is exactly linear — the
Allegro first-layer projection asserts this, ``allegro/nn/_allegro.py:94``).

Bias-free is also what makes padded (zero-embedding) edges stay exactly zero
through every MLP — a structural invariant the static-shape padding relies on.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp


def forward_weight_init(key, shape, dtype=jnp.float32):
    """N(0, 1/fan_in): unit-variance activations at init for bias-free layers."""
    import jax

    fan_in = shape[0]
    return jax.random.normal(key, shape, dtype) / jnp.sqrt(jnp.asarray(fan_in, dtype))


class ScalarMLP(nn.Module):
    """Bias-free MLP: ``[in] -> hidden_dims -> [out]`` with SiLU between layers.

    ``hidden_dims=()`` gives a single linear layer (no nonlinearity anywhere).

    ``precision`` defaults to "highest" — full-f32 matmuls, matching the
    reference's ``allow_tf32: false`` default
    (``/root/reference/configs/tutorial.yaml:166-167``). Recent TPU stacks
    run f32 matmuls with bf16-multiply semantics (~1e-3 rel err) at default
    precision, which breaks 5e-5 force parity. Builders pass ``None`` here
    when the config opts into ``allow_tf32: true``.
    """

    output_dim: int
    hidden_dims: Sequence[int] = ()
    nonlinearity: Optional[Callable] = nn.silu
    param_dtype: jnp.dtype = jnp.float32
    precision: Optional[str] = "highest"
    # (start_col, factor): output columns [start_col:] are scaled by
    # ``factor``, folded into the LAST weight matrix at apply time (a
    # [fan_in, out] elementwise op on the params) instead of multiplying the
    # [E, out] activation — the fused Allegro layers use this to absorb the
    # env scatter_factor (1/sqrt(avg_num_neighbors)) at zero per-edge cost.
    # Exactly equivalent math (scaling commutes through the linear layer).
    out_col_scale: Optional[tuple] = None

    @property
    def is_nonlinear(self) -> bool:
        return len(self.hidden_dims) > 0 and self.nonlinearity is not None

    @nn.compact
    def __call__(self, x, return_weights: bool = False):
        """``x``: array, or a tuple/list of arrays treated as a concat along
        the last axis WITHOUT materializing it — the first matmul runs as a
        sum of per-piece matmuls over row blocks of ``w0``. Params and math
        are identical either way (up to f32 summation order); on a
        bandwidth-bound chip this saves a full write+read of the concat
        (~180 MB/layer at production edge counts).

        ``return_weights=True``: create the parameters (identical names /
        shapes / order — the cross-backend pytree invariant) and return the
        effective weight matrices ``(w0, w1, ...)`` with ``out_col_scale``
        already folded, WITHOUT computing — the mega-fused kernels consume
        the raw weights in-kernel (``ops/fused_tp.latent_env_scatter_call``)."""
        pieces = tuple(x) if isinstance(x, (tuple, list)) else (x,)
        dims = (*self.hidden_dims, self.output_dim)
        in_dim = sum(p.shape[-1] for p in pieces)

        def scale_last(w):
            if self.out_col_scale is None:
                return w
            start, factor = self.out_col_scale
            return jnp.concatenate(
                [w[:, :start], w[:, start:] * jnp.asarray(factor, w.dtype)], axis=1
            )

        w0 = self.param(
            "w0", forward_weight_init, (in_dim, dims[0]), self.param_dtype
        )
        if len(dims) == 1:
            w0 = scale_last(w0)
        if return_weights:
            ws = [w0]
            prev = dims[0]
            for k, d in enumerate(dims[1:], start=1):
                w = self.param(
                    f"w{k}", forward_weight_init, (prev, d), self.param_dtype
                )
                if k == len(dims) - 1:
                    w = scale_last(w)
                ws.append(w)
                prev = d
            return tuple(ws)
        x = None
        off = 0
        for p in pieces:
            blk = w0[off : off + p.shape[-1]].astype(p.dtype)
            t = jnp.dot(p, blk, precision=self.precision)
            x = t if x is None else x + t
            off += p.shape[-1]
        if len(dims) > 1 and self.nonlinearity is not None:
            x = self.nonlinearity(x)
        for k, d in enumerate(dims[1:], start=1):
            w = self.param(
                f"w{k}", forward_weight_init, (x.shape[-1], d), self.param_dtype
            )
            if k == len(dims) - 1:
                w = scale_last(w)
            x = jnp.dot(x, w.astype(x.dtype), precision=self.precision)
            if k < len(dims) - 1 and self.nonlinearity is not None:
                x = self.nonlinearity(x)
        return x

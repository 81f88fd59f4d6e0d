"""Broadcast a single-channel tensor basis into ``mul`` weighted channels.

Role of the reference's ``MakeWeightedChannels``
(``allegro/nn/_strided/_channels.py:15-63``): take the spherical-harmonic
basis ``[E, dim]`` (multiplicity 1) and per-edge learned weights, and produce
strided tensor features ``[E, mul, dim]`` with one weight per (channel, irrep)
when ``weight_individual_irreps`` (the default), else one per channel.

Stateless: the weights are *inputs* (sliced from the latent track), not
parameters — so this is a plain function-object, not a module.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..lib.irreps import Irreps


class MakeWeightedChannels:
    def __init__(self, irreps_in, multiplicity_out: int, weight_individual_irreps: bool = True):
        self.irreps_in = Irreps(irreps_in)
        assert all(mi.mul == 1 for mi in self.irreps_in), "basis must be multiplicity-1"
        self.mul_out = int(multiplicity_out)
        self.weight_individual_irreps = bool(weight_individual_irreps)
        if weight_individual_irreps:
            # 0/1 expansion: weight index -> basis dims of that irrep
            n_ir = len(self.irreps_in)
            rtoi = np.zeros((n_ir, self.irreps_in.dim))
            for k, sl in enumerate(self.irreps_in.slices()):
                rtoi[k, sl] = 1.0
            self._rtoi = rtoi
            self.weight_numel = self.mul_out * n_ir
        else:
            self._rtoi = None
            self.weight_numel = self.mul_out

    def _expand_w_dim_major(self, w):
        """[E, n_irr, mul] → [E, dim, mul] irrep blocks expanded to their
        basis dims — as a concat of broadcasts, NOT ``jnp.repeat`` with uneven
        repeats: that lowers to a gather whose VJP is a scatter-add that XLA
        serializes into a while loop over basis dims (measured 3.3 ms/step at
        production edge counts — the single hottest op of round 2's step).
        Broadcast+concat keeps forward AND backward fully vectorized (VJP =
        slice + sum over the basis-dim axis). Exact like repeat (no matmul:
        MXU f32 at default precision would round weights to bf16)."""
        E = w.shape[0]
        blocks = []
        for k, sl in enumerate(self.irreps_in.slices()):
            m = sl.stop - sl.start
            blocks.append(
                jnp.broadcast_to(w[:, k : k + 1, :], (E, m, self.mul_out))
            )
        return jnp.concatenate(blocks, axis=1) if len(blocks) > 1 else blocks[0]

    def __call__(self, edge_attr, weights):
        """edge_attr [E, dim], weights [E, weight_numel] → [E, mul, dim].

        Weight layout convention: **irrep-major** — ``weights`` columns are
        ``[irrep_0 × mul, irrep_1 × mul, ...]`` (``reshape(E, n_irr, mul)``).
        This is the layout the fused Pallas kernels consume directly (U-wide
        lane blocks per irrep), so the hot path pays no transpose; here the
        layout change folds into the elementwise product. The choice is a
        fixed permutation of learned columns — model-equivalent, but it must
        be consistent across every backend (shared param pytree).

        Checkpoint compatibility: irrep-major has been the one and only
        released convention (the pre-release mul-major experiment never
        shipped a checkpoint format). Any future layout change MUST bump the
        checkpoint format version — shapes are unchanged under permutation,
        so a stale checkpoint would load cleanly and silently compute
        permuted env weights.

        Computed in the flat [E, mul*dim] layout: elementwise ops on arrays
        whose minor dim is the tiny irreps dim waste ~93% of the TPU's 128
        lanes (measured 12x slower); the boundary reshapes are free.
        """
        E = edge_attr.shape[0]
        dim = self.irreps_in.dim
        if self.weight_individual_irreps:
            w = weights.reshape(E, len(self.irreps_in), self.mul_out)
            w_dm = self._expand_w_dim_major(w)  # [E, dim, mul]
            w_full = w_dm.swapaxes(1, 2).reshape(E, self.mul_out * dim)
        else:
            w_full = jnp.repeat(weights.reshape(E, self.mul_out), dim, axis=1)
        sh_rep = jnp.tile(edge_attr, (1, self.mul_out))  # [E, mul*dim]
        return (sh_rep * w_full).reshape(E, self.mul_out, dim)

    def flat_dim_major(self, edge_attr, weights):
        """Same product, built directly in the FLAT dim-major layout
        ``[E, dim*mul]`` the fused kernels consume — no [E, mul, dim]
        intermediate and no transpose on the hot path."""
        E = edge_attr.shape[0]
        dim = self.irreps_in.dim
        sh_rep = jnp.repeat(edge_attr, self.mul_out, axis=1)  # [E, dim*mul]
        if self.weight_individual_irreps:
            w = weights.reshape(E, len(self.irreps_in), self.mul_out)
            w_full = self._expand_w_dim_major(w).reshape(E, dim * self.mul_out)
        else:
            w_full = jnp.tile(weights.reshape(E, self.mul_out), (1, dim))
        return sh_rep * w_full

    # static map: basis dim -> irrep index (for the dim-major construction)
    def _dim_to_irrep(self):
        out = []
        for k, sl in enumerate(self.irreps_in.slices()):
            out.extend([k] * (sl.stop - sl.start))
        return out

    def dim_major(self, edge_attr, weights):
        """Same product, built directly in dim-major layout [dim, E, mul] —
        no transpose of the big array (the TPU kernel path's layout)."""
        E = edge_attr.shape[0]
        if self.weight_individual_irreps:
            w = weights.reshape(E, len(self.irreps_in), self.mul_out)
            cols = []
            for d_, ir in enumerate(self._dim_to_irrep()):
                cols.append(edge_attr[:, d_, None] * w[:, ir, :])  # [E, mul]
            return jnp.stack(cols, axis=0)  # [dim, E, mul]
        w = weights.reshape(E, self.mul_out)
        return edge_attr.T[:, :, None] * w[None, :, :]

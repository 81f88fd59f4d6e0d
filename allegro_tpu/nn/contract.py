"""Strided channelwise Clebsch–Gordan tensor product, fused with the
neighbor-environment scatter/gather.

This is the heart of the model — the TPU-native counterpart of the reference
Contracter (``allegro/nn/_strided/_contract.py:33-251``). Semantics preserved:

- Data layout is *strided* ``[z, mul, dim]``: all irreps multiplicity-1 in the
  basis axis, channel multiplicity factored into ``mul``
  (cf. ``allegro/nn/_allegro.py:171-175``).
- Paths are auto-enumerated: every ``(i1, i2, i_out)`` triple allowed by the
  O(3) selection rules (``_contract.py:51-57``).
- Per-path Wigner 3j blocks carry "component" normalization
  ``sqrt(2 l_out + 1)`` (``_contract.py:95-115``).
- Learned path-mixing weights: shape ``(mul, P)`` when
  ``path_channel_coupling`` ("uuup") else ``(P,)`` ("p"); init U(−√3, √3)
  (``_contract.py:170-177``).
- Forward fuses the neighbor-environment aggregation: scale ``x2`` by
  ``scatter_factor``, scatter edges→atoms (sum over each center's
  environment), gather atoms→edges, then contract against ``x1``
  (``_contract.py:185-211``).

TPU-first differences: static padded shapes throughout; the contraction is a
dense ``jnp.einsum`` over the small packed ``[P, d1, d2, d3]`` 3j buffer —
XLA fuses and tiles it onto the MXU/VPU. A fused Pallas kernel backend with a
custom VJP lives in ``allegro_tpu.ops`` and can be swapped in by model
modifiers while keeping this module's parameter pytree unchanged.
"""

from __future__ import annotations

import math
import os
from typing import List, Optional, Tuple

import numpy as np
import flax.linen as nn
import jax
import jax.numpy as jnp

from ..lib.irreps import Irrep, Irreps
from ..lib.wigner import wigner_3j


def enumerate_instructions(
    irreps_in1: Irreps, irreps_in2: Irreps, irreps_out: Irreps
) -> List[Tuple[int, int, int]]:
    """All (i1, i2, i_out) index triples allowed by the selection rules."""
    ins = []
    for a, mi1 in enumerate(irreps_in1):
        for b, mi2 in enumerate(irreps_in2):
            for c, mio in enumerate(irreps_out):
                if mio.ir in mi1.ir * mi2.ir:
                    ins.append((a, b, c))
    return ins


def pack_w3j(
    irreps_in1: Irreps,
    irreps_in2: Irreps,
    irreps_out: Irreps,
    instructions: List[Tuple[int, int, int]],
    irrep_normalization: str = "component",
) -> np.ndarray:
    """Dense packed 3j buffer [P, dim1, dim2, dim_out], float64.

    Each path's wigner_3j block is placed at its irreps' basis slices and
    scaled by sqrt(2 l_out + 1) under "component" normalization.
    """
    s1, s2, s3 = irreps_in1.slices(), irreps_in2.slices(), irreps_out.slices()
    out = np.zeros((len(instructions), irreps_in1.dim, irreps_in2.dim, irreps_out.dim))
    for p, (a, b, c) in enumerate(instructions):
        l1, l2, l3 = irreps_in1[a].ir.l, irreps_in2[b].ir.l, irreps_out[c].ir.l
        w = wigner_3j(l1, l2, l3)
        if irrep_normalization == "component":
            w = w * math.sqrt(2 * l3 + 1)
        elif irrep_normalization == "norm":
            w = w * math.sqrt((2 * l1 + 1) * (2 * l2 + 1))
        elif irrep_normalization != "none":
            raise ValueError(f"unknown irrep_normalization {irrep_normalization}")
        out[p, s1[a], s2[b], s3[c]] = w
    return out


class Contracter(nn.Module):
    """Channelwise CG tensor product with fused env scatter/gather.

    ``__call__(x1 [E, mul, d1], x2 [E, mul, d2], centers [E], n_atoms)``
    → ``[E, mul, d_out]``.
    """

    # irreps as strings: flax freezes dataclass fields into plain tuples,
    # which would destroy the Irreps/Irrep subclasses
    irreps_in1: str
    irreps_in2: str
    irreps_out: str
    mul: int
    path_channel_coupling: bool = True
    scatter_factor: Optional[float] = None  # e.g. 1/sqrt(avg_num_neighbors)
    irrep_normalization: str = "component"
    param_dtype: jnp.dtype = jnp.float32
    # "einsum" (XLA loop-over-i), "pallas" (fused sparse-CG kernel), or
    # "fused" (second-generation kernels fusing env scatter/gather + CG —
    # role of the reference's FlashAllegro/cuEq in-kernel gather,
    # _flashallegro.py:24-282, _cueq_contracter.py:104-123).
    # Swapping backends keeps the parameter pytree identical (the reference
    # guarantees the same via state_dict transfer, _contract.py:277,305-306).
    kernel_backend: str = "einsum"
    # chunk the direct-einsum contraction over edges (lax.map): bounds XLA's
    # [E_chunk, mul, d1, d3] temporary so it stays memory-feasible at large
    # edge counts. None = no chunking.
    chunk_edges: Optional[int] = None
    # "highest" (default, reference allow_tf32=false parity) or None (fast
    # MXU semantics when the config opts into allow_tf32: true). The Pallas
    # kernel backends are exact regardless.
    precision: Optional[str] = "highest"
    # one-hot split passes in the fused kernels (3 = exact f32, 2 = reduced);
    # None = process default at trace time (see nn.allegro.AllegroLayers)
    onehot_passes: Optional[int] = None

    def setup(self):
        irreps_in1 = Irreps(self.irreps_in1)
        irreps_in2 = Irreps(self.irreps_in2)
        irreps_out = Irreps(self.irreps_out)
        assert all(mi.mul == 1 for mi in irreps_in1 + irreps_in2 + irreps_out)
        self._instructions = enumerate_instructions(irreps_in1, irreps_in2, irreps_out)
        assert len(self._instructions) > 0, "no valid paths"
        self._w3j = pack_w3j(
            irreps_in1, irreps_in2, irreps_out, self._instructions, self.irrep_normalization
        )
        P = len(self._instructions)
        shape = (self.mul, P) if self.path_channel_coupling else (P,)
        bound = math.sqrt(3.0)
        self.path_weights = self.param(
            "path_weights",
            lambda key, s, d: jax.random.uniform(key, s, d, -bound, bound),
            shape,
            self.param_dtype,
        )
        if self.kernel_backend == "pallas":
            from ..ops.pallas_contract import PallasTPBackend

            self._pallas = PallasTPBackend(self._w3j)
        else:
            self._pallas = None
        if self.kernel_backend in ("fused", "fused_infer"):
            from ..ops.pallas_contract import sparse_entries

            self._fused_entries = sparse_entries(self._w3j)
            self._dim_to_irr = tuple(
                k
                for k, sl in enumerate(irreps_in2.slices())
                for _ in range(sl.stop - sl.start)
            )

    @property
    def num_paths(self) -> int:
        return len(self._instructions)

    def n_scalar_outs(self) -> int:
        return sum(1 for mi in Irreps(self.irreps_out) if mi.ir.l == 0)

    def env_sum(self, x2, centers, n_atoms: int):
        """Neighbor-environment aggregation: scatter edges→atoms, gather back.

        Runs in the flat [E, mul*dim] layout (free reshapes) — scatters and
        gathers on minor-dim-9 arrays waste the TPU lanes (2x measured).
        """
        shape = x2.shape
        x2 = x2.reshape(shape[0], -1)
        if self.scatter_factor is not None:
            x2 = x2 * jnp.asarray(self.scatter_factor, dtype=x2.dtype)
        x2_atoms = jax.ops.segment_sum(x2, centers, num_segments=n_atoms)
        return jnp.take(x2_atoms, centers, axis=0, mode="clip").reshape(shape)

    def contract_reference(self, x1, x2):
        """Direct three-operand einsum — the correctness oracle the optimized
        paths and kernel backends are tested against. With ``chunk_edges``
        set, the contraction maps over edge chunks (bounded temporaries)."""
        E = x1.shape[0]
        if self.chunk_edges is not None and E > self.chunk_edges:
            C = self.chunk_edges
            Ep = -(-E // C) * C
            pad = Ep - E
            if pad:
                x1 = jnp.pad(x1, ((0, pad), (0, 0), (0, 0)))
                x2 = jnp.pad(x2, ((0, pad), (0, 0), (0, 0)))
            x1c = x1.reshape(Ep // C, C, *x1.shape[1:])
            x2c = x2.reshape(Ep // C, C, *x2.shape[1:])
            out = jax.lax.map(
                lambda ab: self._contract_direct(ab[0], ab[1]), (x1c, x2c)
            )
            return out.reshape(Ep, *out.shape[2:])[:E]
        return self._contract_direct(x1, x2)

    def _contract_direct(self, x1, x2):
        dtype = x1.dtype
        prec = self.precision
        w3j = jnp.asarray(self._w3j, dtype=dtype)
        w = self.path_weights.astype(dtype)
        if self.path_channel_coupling:
            ww = jnp.einsum("up,pijk->uijk", w, w3j, precision=prec)
            return jnp.einsum("zui,zuj,uijk->zuk", x1, x2, ww, precision=prec)
        ww = jnp.einsum("p,pijk->ijk", w, w3j, precision=prec)
        return jnp.einsum("zui,zuj,ijk->zuk", x1, x2, ww, precision=prec)

    def contract(self, x1, x2):
        """CG contraction, decomposed as a static loop over the first input's
        basis dims: ``out += x1[..., i:i+1] * (x2 @ WW[:, i])``.

        XLA's direct lowering of the three-operand einsum materializes a
        ``[E, mul, d1, d3]`` (or ``[E, mul, d1, d2]``) HBM temporary — ~1.5 GB
        at production edge counts, 7x slower on TPU (measured). The loop form
        keeps one ``[E, mul, d3]`` accumulator that XLA fuses into the matmul
        epilogue. The Pallas backend in ``allegro_tpu.ops`` fuses further.
        """
        dtype = x1.dtype
        prec = self.precision
        w3j = jnp.asarray(self._w3j, dtype=dtype)
        w = self.path_weights.astype(dtype)
        d1 = x1.shape[-1]
        if self.path_channel_coupling:
            ww = jnp.einsum("up,pijk->uijk", w, w3j, precision=prec)  # [U, d1, d2, d3]
            out = None
            for i in range(d1):
                y = jnp.einsum("zuj,ujk->zuk", x2, ww[:, i], precision=prec)
                t = x1[:, :, i : i + 1] * y
                out = t if out is None else out + t
            return out
        ww = jnp.einsum("p,pijk->ijk", w, w3j, precision=prec)  # [d1, d2, d3]
        out = None
        for i in range(d1):
            y = jnp.matmul(x2, ww[i], precision=prec)
            t = x1[:, :, i : i + 1] * y
            out = t if out is None else out + t
        return out

    def env_sum_dim_major(self, x2_dm, centers, n_atoms: int):
        """Environment aggregation in dim-major layout [d2, E, U]."""
        if self.scatter_factor is not None:
            x2_dm = x2_dm * jnp.asarray(self.scatter_factor, dtype=x2_dm.dtype)
        seg = jax.vmap(
            lambda x: jax.ops.segment_sum(x, centers, num_segments=n_atoms)
        )(x2_dm)
        return jnp.take(seg, centers, axis=1, mode="clip")

    def _pallas_weights(self, dtype):
        # primitive-based kernels only compute the cotangents that are
        # requested, so weights stay differentiable (training-capable backend)
        return self.path_weights.astype(dtype)

    def packed_call_edge_major(self, x1_packed, x2, centers, n_atoms: int):
        """Packed fast path with edge-major env aggregation: ONE segment-sum
        over [E, U, d2], then a transpose-pack."""
        assert self._pallas is not None
        x2_env = self.env_sum(x2, centers, n_atoms)
        from ..ops.pallas_contract import pack_edge_major

        x2p = pack_edge_major(x2_env)
        w = self._pallas_weights(x1_packed.dtype)
        return self._pallas.contract_packed(x1_packed, x2p, w, U=x2.shape[1])

    def packed_call(self, x1_packed, x2_dm, centers, n_atoms: int, mul: int):
        """Fast path: x1 already packed [d1, R, 128]; x2 dim-major [d2, E, U]
        (env sum fused here; the lane reshape is free). Returns [d3, R, 128]."""
        assert self._pallas is not None
        x2_env = self.env_sum_dim_major(x2_dm, centers, n_atoms)
        d2 = x2_env.shape[0]
        x2p = x2_env.reshape(d2, -1, self._pallas.LANES)
        w = self._pallas_weights(x1_packed.dtype)
        return self._pallas.contract_packed(x1_packed, x2p, w, U=mul)

    def fused_call(self, x, sh, wexp, offs, win, n_rank_rows: int, eb: int,
                   wr: int | None = None):
        """Fully-fused layer update (env-weight + scatter + gather + CG-TP).

        x [Ep, d1*U] tensor features (flat dim-major columns); sh [Ep, d2]
        basis; wexp [Ep, n_irr*U] env weights (irr-major). Requires
        center-sorted edges with sentinel padding (block plan from
        ``fused_tp.make_block_plan``). Returns [Ep, d_out*U].
        """
        from ..ops.fused_primitives import fused_layer, fused_layer_infer

        P, d1, d2, d3 = self._w3j.shape
        if os.environ.get("ALLEGRO_TP_BYPASS") == "1":
            # profiling ablation: shape-preserving cheap stand-in for the TP
            # kernels (keeps every surrounding op + AD structure alive).
            # LOUD warning: energies/forces are garbage if this env var leaks
            # from a profiling session into a real run.
            import warnings

            warnings.warn(
                "ALLEGRO_TP_BYPASS=1 is active: the tensor product is "
                "REPLACED by a profiling stub — energies and forces are "
                "meaningless. Unset ALLEGRO_TP_BYPASS for real runs.",
                stacklevel=2,
            )
            U = self.mul
            q = min(d1, d3)
            stub = jnp.zeros((x.shape[0], d3 * U), x.dtype)
            stub = stub.at[:, : q * U].set(x[:, : q * U])
            return stub * jnp.mean(wexp) * jnp.mean(sh)
        w = self.path_weights.astype(x.dtype)
        if self.path_channel_coupling:
            wk = w.T  # (mul, P) -> [P, U]
        else:
            wk = jnp.broadcast_to(w[:, None], (P, self.mul))
        if self.scatter_factor is not None:
            wexp = wexp * jnp.asarray(self.scatter_factor, dtype=wexp.dtype)
        if self.kernel_backend == "fused_infer":
            # one-pass fused backward; first-order AD only (MD/deploy scope)
            return fused_layer_infer(
                x, sh, wexp, wk, offs, win,
                self._fused_entries, (d1, d2, d3), self.mul, eb,
                self._dim_to_irr, n_rank_rows, self.onehot_passes, wr,
            )
        return fused_layer(
            x, sh, wexp, wk, offs, win,
            entries=self._fused_entries, dims=(d1, d2, d3), U=self.mul, eb=eb,
            dim_to_irr=self._dim_to_irr, n_rank_rows=n_rank_rows,
            passes=self.onehot_passes, wr=wr,
        )

    def fused_infer_parts(self, dtype):
        """(wk [P, U], entries, dims, dim_to_irr) for the mega-fused
        inference path (``nn/allegro.py`` drives the kernels directly)."""
        P, d1, d2, d3 = self._w3j.shape
        w = self.path_weights.astype(dtype)
        if self.path_channel_coupling:
            wk = w.T
        else:
            wk = jnp.broadcast_to(w[:, None], (P, self.mul))
        assert self.scatter_factor is None, "mega path expects folded factor"
        return wk, self._fused_entries, (d1, d2, d3), self._dim_to_irr

    def __call__(self, x1, x2, centers, n_atoms: int):
        x2_env = self.env_sum(x2, centers, n_atoms)
        if self._pallas is not None:
            w = self._pallas_weights(x1.dtype)
            return self._pallas(x1, x2_env, w)
        if self.kernel_backend == "einsum_direct":
            return self.contract_reference(x1, x2_env)
        return self.contract(x1, x2_env)

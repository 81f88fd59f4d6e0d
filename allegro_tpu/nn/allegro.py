"""The Allegro two-track layer stack (scalar latents + strided tensor track).

TPU-native re-implementation of the reference ``Allegro_Module``
(``allegro/nn/_allegro.py``). Architecture contract preserved:

- Irreps ladder: forward pass allows ``tensor_track_allowed_irreps`` per layer
  (last layer only ``0e``), pruned to irreps reachable from
  ``input ⊗ sh``; then a backward pass prunes irreps that cannot reach the
  final scalars (``_allegro.py:112-154``).
- A linear "first layer projection" maps two-body scalars to the initial
  scalar features + first env weights (``_allegro.py:90-94``).
- Per layer: env-weight the SH basis into channels, contract against the
  tensor features with the environment sum fused in
  (``scatter_factor = 1/sqrt(avg_num_neighbors)``, ``_allegro.py:179-183``),
  extract exactly one scalar (``n_scalar_outs = 1`` — the leading ``0e``;
  pseudo-scalars stay in the tensor track, ``_allegro.py:186-189``), then a
  latent MLP on the densenet-style concat of all previous scalar features
  (``_allegro.py:192-213``), sliced into next scalar features + next env
  weights (``_allegro.py:283-294``).
- Output: concat of all ``num_layers + 1`` scalar feature blocks
  (``_allegro.py:217-223``).

Everything is static-shape: the ladder, path sets, and slice boundaries are
computed at module-construction time on the host; the traced computation is a
fixed sequence of gathers, segment-sums, matmuls, and einsums.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import math
import os

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..data import keys
from ..lib.irreps import Irrep, Irreps, tp_path_exists
from .channels import MakeWeightedChannels
from .contract import Contracter
from .mlp import ScalarMLP


def compute_irreps_ladder(
    irreps_sh: Irreps, allowed: Irreps, num_layers: int
) -> List[Irreps]:
    """Per-layer tensor-track irreps: [input, out_0, ..., out_{L-1}]."""
    irreps_sh = Irreps(irreps_sh)
    allowed = Irreps(allowed).sorted().merged()
    ladder = [irreps_sh]
    for layer in range(num_layers):
        targets = Irreps("1x0e") if layer == num_layers - 1 else allowed
        out = Irreps(
            [
                (1, mi.ir)
                for mi in targets
                if tp_path_exists(ladder[-1], irreps_sh, mi.ir)
            ]
        )
        assert len(out) > 0 and out[0].ir == Irrep("0e"), (
            f"layer {layer}: ladder must start with 0e, got {out}"
        )
        ladder.append(out)
    # backward prune: keep only irreps that can still produce a wanted output
    for layer in reversed(range(num_layers)):
        wanted = ladder[layer + 1]
        kept = []
        for mi in ladder[layer]:
            if any(
                any(ir in [w.ir for w in wanted] for ir in mi.ir * sh.ir)
                for sh in irreps_sh
            ):
                kept.append((1, mi.ir))
        ladder[layer] = Irreps(kept)
    return ladder


def _subset_dims(full: Irreps, subset: Irreps) -> List[int]:
    """Basis-dim indices of ``subset``'s irreps inside ``full`` (ordered)."""
    dims: List[int] = []
    used = set()
    full_slices = full.slices()
    for mi in subset:
        for k, fmi in enumerate(full):
            if fmi.ir == mi.ir and k not in used:
                used.add(k)
                dims.extend(range(full_slices[k].start, full_slices[k].stop))
                break
        else:
            raise ValueError(f"{mi} not found in {full}")
    return dims


# how the packed (pallas) path builds + env-sums the weighted SH tensor:
# "dim_major": constructed dim-major (no transpose) but d separate scatters;
# "edge_major": one big scatter then a transpose. Measured per-hardware.
PACKED_ENV_VARIANT = "edge_major"

# edge-block size of the fused kernel backend (rank-space window width);
# trade-off: the one-hot window matmuls cost O(eb)/edge (MXU), per-block
# fixed overheads cost O(1/eb). This is the PROCESS-WIDE DEFAULT only —
# per-model values come from the builder kwarg ``fused_block_edges``
# (serialized into artifacts/rebuilds; VERDICT r3 #9), which wins over this.
FUSED_BLOCK_EDGES = int(os.environ.get("ALLEGRO_FUSED_EB", "128"))

# window row-block size of the block plan (None/0 = eb, the classic plan,
# valid for ANY edge distribution). wr < eb narrows the window pair to one
# <=128-row MXU operand per one-hot product; combined with a big eb it also
# amortizes per-grid-step overheads (eb=512/wr=64: 1.27x over eb=128 classic
# at flagship density, recorded in the driver bench JSON). Validity depends on the edge
# distribution: Model.precompute_statics validates on host and silently
# degrades to wr = eb; the wr actually in force travels with the plan
# (shape of data[FUSED_WR]). Process default only — the builder kwarg
# ``window_rows`` wins.
WINDOW_ROWS = int(os.environ.get("ALLEGRO_WINDOW_ROWS", "0")) or None


class AllegroLayers(nn.Module):
    """Consumes EDGE_EMBEDDING/EDGE_ATTRS/EDGE_FEATURES, writes EDGE_SCALARS."""

    irreps_sh: str
    tensor_track_allowed_irreps: str
    num_layers: int = 2
    num_scalar_features: int = 64
    num_tensor_features: int = 16
    avg_num_neighbors: float = 1.0
    mlp_hidden_dims: Sequence[int] = (64,)
    tp_path_channel_coupling: bool = True
    weight_individual_irreps: bool = True
    param_dtype: jnp.dtype = jnp.float32
    tp_kernel_backend: str = "einsum"  # or "pallas"/"fused"/"fused_infer"
    tp_chunk_edges: int = 0  # >0: chunk the einsum TP over edges (lax.map)
    # "highest" = reference allow_tf32=false parity (full-f32 matmuls)
    precision: str | None = "highest"
    # storage dtype of the per-edge tensor track between layers (fused
    # backends only): "bfloat16" halves the dominant HBM traffic and doubles
    # the single-chip atom ceiling; every in-kernel product/accumulation
    # stays f32 (see ops/fused_tp.compute_dtype). None = param_dtype (exact).
    tensor_dtype: str | None = None
    # rematerialize each layer in the backward pass: trades ~30% compute for
    # O(1)-layer activation memory — required for >~50k-atom force calls on a
    # 16GB chip (jax.checkpoint per layer)
    remat: bool = False
    # edge-block size of the fused kernels (rank-window width); None = the
    # process default FUSED_BLOCK_EDGES. A model-level setting so exported
    # artifacts replay with the block size they were built with.
    fused_block_edges: int | None = None
    # one-hot split pass count for the fused kernels' window gather/scatter
    # MXU products on the FEATURE track (3 = exact f32, 2 = ~7.6e-6 rel at
    # 2/3 the MXU cost). None = the process default
    # (ops.fused_tp.ONEHOT_PASSES, env-overridable) resolved at trace time.
    # Position gathers and energy sums are ALWAYS exact regardless.
    onehot_passes: int | None = None
    # packed (legacy pallas) backend env construction variant; None = the
    # module default PACKED_ENV_VARIANT ("edge_major"/"dim_major")
    packed_env_variant: str | None = None
    # mega-fused inference layers: a MODEL setting (serialized via builder
    # kwargs — VERDICT r4 #6) so exports/rebuilds replay with identical
    # kernel selection; None = the process default (env ALLEGRO_NO_MEGA
    # kill-switch)
    use_mega: bool | None = None

    def setup(self):
        irreps_sh = Irreps(self.irreps_sh)
        # NOTE: only store plain data (strings/ints) on self — flax freezes
        # attributes, destroying tuple subclasses like Irreps.
        ladder = compute_irreps_ladder(
            irreps_sh, Irreps(self.tensor_track_allowed_irreps), self.num_layers
        )
        self._env_weighter = MakeWeightedChannels(
            irreps_sh, self.num_tensor_features, self.weight_individual_irreps
        )
        S = self.num_scalar_features
        env_numel = self._env_weighter.weight_numel
        scatter_factor = 1.0 / math.sqrt(self.avg_num_neighbors)
        # fused backends absorb the env scatter_factor into the producing
        # MLPs' last weight matrix (a [fan_in, out] op on params) instead of
        # multiplying every per-edge env-weight array (4x [E, env_numel]
        # fusions/step measured). Exactly equivalent by linearity.
        fold_factor = self.tp_kernel_backend in ("fused", "fused_infer")
        env_scale = (S, scatter_factor) if fold_factor else None
        # linear first-layer projection: two-body scalars -> scalars_0 + env_w_0
        self.first_projection = ScalarMLP(
            S + env_numel, hidden_dims=(), param_dtype=self.param_dtype,
            precision=self.precision, out_col_scale=env_scale,
        )
        tps = []
        latents = []
        for layer in range(self.num_layers):
            tps.append(
                Contracter(
                    irreps_in1=str(ladder[layer]),
                    irreps_in2=str(irreps_sh),
                    irreps_out=str(ladder[layer + 1]),
                    mul=self.num_tensor_features,
                    path_channel_coupling=self.tp_path_channel_coupling,
                    scatter_factor=None if fold_factor else scatter_factor,
                    param_dtype=self.param_dtype,
                    kernel_backend=self.tp_kernel_backend,
                    chunk_edges=self.tp_chunk_edges or None,
                    precision=self.precision,
                    onehot_passes=self.onehot_passes,
                )
            )
            last = layer == self.num_layers - 1
            latents.append(
                ScalarMLP(
                    S + (0 if last else env_numel),
                    hidden_dims=tuple(self.mlp_hidden_dims),
                    param_dtype=self.param_dtype,
                    precision=self.precision,
                    out_col_scale=None if last else env_scale,
                )
            )
        self.tps = tps
        self.latents = latents
        self._ladder_strs = tuple(str(l) for l in ladder)
        # layer-0 tensor-feature slice if backward pruning shrank the input
        if ladder[0] == irreps_sh:
            self._input_dims = None
        else:
            self._input_dims = tuple(_subset_dims(irreps_sh, ladder[0]))

    def __call__(self, data: Dict) -> Dict:
        S = self.num_scalar_features
        n_atoms = data[keys.POSITIONS].shape[0]
        centers = data[keys.EDGE_INDEX][0]
        sh = data[keys.EDGE_ATTRS].astype(self.param_dtype)
        features = data[keys.EDGE_FEATURES]
        E, U = features.shape[0], self.num_tensor_features
        flat_in = features.ndim == 2  # already [E, d*U] (flat_dim_major embed)
        if self._input_dims is not None and not flat_in:
            features = features[:, :, jnp.asarray(self._input_dims)]
        fused = self.tp_kernel_backend in ("fused", "fused_infer")
        packed = self.tp_kernel_backend == "pallas"
        assert not (flat_in and not fused), "flat features need a fused backend"
        if fused:
            # Fused kernel layout: tensor track is flat [Ep, d*U] (basis-dim-
            # major column blocks of U lanes). Requires center-sorted edges
            # with sentinel (>= n_atoms) padding — the data pipeline's
            # canonical order (data/neighborlist.py, data/atomic_data.py).
            from ..ops.fused_tp import make_block_plan, num_rank_rows

            eb = self.fused_block_edges or FUSED_BLOCK_EDGES
            Ep = -(-E // eb) * eb
            if Ep != E:
                pad_spec = ((0, Ep - E),) + ((0, 0),) * (features.ndim - 1)
                features = jnp.pad(features, pad_spec)
                sh_p = jnp.pad(sh, ((0, Ep - E), (0, 0)))
                centers_p = jnp.pad(
                    centers, (0, Ep - E), constant_values=n_atoms
                )
            else:
                sh_p, centers_p = sh, centers
            if flat_in:
                # already flat dim-major; apply ladder-pruning (if any) as a
                # static dim-block column selection
                if self._input_dims is not None:
                    blocks = [
                        features[:, d * U : (d + 1) * U]
                        for d in self._input_dims
                    ]
                    features = jnp.concatenate(blocks, axis=1)
            else:
                d1 = features.shape[-1]
                features = features.transpose(0, 2, 1).reshape(Ep, d1 * U)
            if self.tensor_dtype is not None:
                features = features.astype(jnp.dtype(self.tensor_dtype))
            wr = None
            if (
                keys.FUSED_OFFS in data
                and data[keys.FUSED_OFFS].shape == (Ep // eb * 8, eb)
            ):
                # precomputed per neighbor list (Model.precompute_statics) —
                # position-independent, so deriving it inside the jitted step
                # wastes ~0.5 ms/step at production edge counts
                offs, win = data[keys.FUSED_OFFS], data[keys.FUSED_WIN]
                # the window row-block size travels WITH the plan (shape-
                # encoded; absent = classic wr = eb) — host-validated by
                # precompute_statics, so a narrow plan is always safe here
                if keys.FUSED_WR in data:
                    wr = data[keys.FUSED_WR].shape[0]
            else:
                win, offs = make_block_plan(centers_p, eb)
                # The fused kernels silently assume center-sorted REAL edges
                # with trailing padding; the host plan
                # (Model.precompute_statics) raises on violation, but this
                # in-jit fallback serves arbitrary user data — poison the
                # basis with NaN on violating input so wrong environments
                # surface as NaN energies instead of silently wrong numbers.
                # Masked (padding) edges are exempt from the order check
                # (zero-padded trailing edges scatter zeros — harmless), but
                # must be TRAILING (a real edge after a pad would sit in a
                # wrong rank window).
                if keys.EDGE_MASK in data:
                    m = data[keys.EDGE_MASK]
                    if m.shape[0] != Ep:
                        m = jnp.pad(m, (0, Ep - m.shape[0]))
                    pair_real = jnp.logical_and(m[1:], m[:-1])
                    order_ok = jnp.all(
                        jnp.logical_or(
                            centers_p[1:] >= centers_p[:-1],
                            jnp.logical_not(pair_real),
                        )
                    )
                    pad_seen = jnp.cumsum(
                        jnp.logical_not(m).astype(jnp.int32)
                    ) > 0
                    trailing_ok = jnp.logical_not(
                        jnp.any(jnp.logical_and(m, pad_seen))
                    )
                    ok = jnp.logical_and(order_ok, trailing_ok)
                else:
                    ok = jnp.all(centers_p[1:] >= centers_p[:-1])
                sh_p = jnp.where(ok, sh_p, jnp.nan)
            plan = (offs, win)
            n_rank = num_rank_rows(n_atoms, wr or eb)
        elif packed:
            # Tensor track lives in packed dim-major layout between layers:
            # (E, U) pairs ride the 128-lane axis, every basis-dim slice is a
            # perfect VPU tile. Entry needs one transpose of the initial
            # features; per-layer env tensors are CONSTRUCTED dim-major
            # (no transposes), and the final "unpack" is free (only the
            # leading scalar row is ever read).
            import math as _math

            L = self.tps[0]._pallas.LANES
            g = L // _math.gcd(U, L)
            Ep = -(-E // g) * g
            if Ep != E:
                features = jnp.pad(features, ((0, Ep - E), (0, 0), (0, 0)))
                sh_p = jnp.pad(sh, ((0, Ep - E), (0, 0)))
                centers_p = jnp.pad(centers, (0, Ep - E))
            else:
                sh_p, centers_p = sh, centers
            features = self.tps[0]._pallas.pack(features)
        else:
            sh_p, centers_p, Ep = sh, centers, E
        if (
            fused
            and self.tp_kernel_backend == "fused_infer"
            and len(self.mlp_hidden_dims) == 1
            # per-irrep env weights: the mega kernel slices [S:] as
            # [n_irr*U] directly (the shared-weight variant needs the tile
            # expansion of the fallback path)
            and self.weight_individual_irreps
            and os.environ.get("ALLEGRO_TP_BYPASS") != "1"
            # model kwarg wins; env ALLEGRO_NO_MEGA is the process-default
            # kill-switch only
            and (
                self.use_mega
                if self.use_mega is not None
                else os.environ.get("ALLEGRO_NO_MEGA") != "1"
            )
        ):
            # mega-fused inference: latent MLP + env-weight slice + env
            # scatter run as ONE kernel per layer; the hidden/env activations
            # never exist in HBM (TODO.md "per-layer mega-kernel")
            out = dict(data)
            out[keys.EDGE_SCALARS] = self._mega_forward(
                data, features, sh_p, plan, n_rank, E, Ep, U, S, wr
            )
            return out
        proj = self.first_projection(data[keys.EDGE_EMBEDDING])
        scalar_blocks = [proj[:, :S]]
        env_w = proj[:, S:]
        if self.remat:
            # flax's lifted remat (plain jax.checkpoint leaks tracers when
            # params are created inside during init)
            body = nn.remat(
                AllegroLayers._layer_body, static_argnums=(1,), prevent_cse=False
            )
        else:
            body = AllegroLayers._layer_body
        if fused:
            mode, centers_arg, n_rank_static = "fused", plan, n_rank
            wr_static = wr
        elif packed:
            mode, centers_arg, n_rank_static = "packed", centers_p, 0
            wr_static = None
        else:
            mode, centers_arg, n_rank_static = "plain", centers_p, 0
            wr_static = None
        statics = (mode, E, U, Ep, n_atoms, n_rank_static, wr_static)
        for layer in range(self.num_layers):
            features, lat = body(
                self, (layer,) + statics, features, env_w, tuple(scalar_blocks),
                sh_p, centers_arg,
            )
            scalar_blocks.append(lat[:, :S])
            env_w = lat[:, S:]
        out = dict(data)
        # tuple of blocks, not a materialized concat: the readout ScalarMLP
        # consumes pieces directly (first-matmul row-block split)
        out[keys.EDGE_SCALARS] = tuple(scalar_blocks)
        return out

    def _mlp_passes(self) -> int:
        """In-kernel MLP dot policy: 6 = exact-f32 HIGHEST (reference
        allow_tf32=false parity), 3 = the "high" bf16 split (~1e-7 rel error
        at half the MXU streaming cost — the dominant cost of the mega
        kernels, round-4 trace attribution). Driven by the model-level
        ``precision`` field, same as the XLA-side dots."""
        return 3 if self.precision == "high" else 6

    def _mega_forward(self, data, features, sh_p, plan, n_rank, E, Ep, U, S,
                      wr=None):
        """Mega-fused inference stack: per layer, ONE kernel runs the latent
        MLP + env-weight slice + env scatter (``mega_latent_env``) and one
        runs the env gather + CG-TP (``gather_tp_infer``) with the one-pass
        fused backward. Parameters are the SAME modules/pytree as every
        other backend (``ScalarMLP(..., return_weights=True)``)."""
        from ..ops.fused_primitives import mega_latent_env

        offs, win = plan
        eb = self.fused_block_edges or FUSED_BLOCK_EDGES
        wexp_dtype = (
            jnp.dtype(self.tensor_dtype) if self.tensor_dtype is not None else None
        )
        emb = data[keys.EDGE_EMBEDDING]
        if emb.shape[0] != Ep:
            emb = jnp.pad(emb, ((0, Ep - emb.shape[0]), (0, 0)))
        emb = emb.astype(self.param_dtype)
        dim_to_irr = self.tps[0]._dim_to_irr
        # layer-0 env weights: the (linear) first projection as a no-hidden
        # mega call — its scalar slice is scalar block 0
        (w_proj,) = self.first_projection((emb,), return_weights=True)
        lat_s, eA, eB = mega_latent_env(
            (emb,), sh_p, w_proj, None, offs, win,
            tuple(dim_to_irr), U, eb, n_rank, S, wexp_dtype,
            self._mlp_passes(), self.onehot_passes, wr,
        )
        scalar_blocks = [lat_s]
        # layer-0 input: prefer the FACTOR form of the tensor embedding
        # (sh ⊗ two-body channel weights) — the embed-fused kernel builds x0
        # on the fly, so the [Ep, d1*U] initial features and their cotangent
        # never exist in HBM (the expanded EDGE_FEATURES is dead code)
        w2b = data.get(keys.EDGE_FEATURE_WEIGHTS)
        if w2b is not None:
            if w2b.shape[0] != Ep:
                w2b = jnp.pad(w2b, ((0, Ep - w2b.shape[0]), (0, 0)))
            x = w2b.astype(self.param_dtype)
            in_dims = self._input_dims or tuple(range(len(dim_to_irr)))
            row_specs = tuple((j, dim_to_irr[j]) for j in in_dims)
        else:
            x = features
            row_specs = ()

        body = AllegroLayers._mega_layer_body
        if self.remat:
            body = nn.remat(body, static_argnums=(1,), prevent_cse=False)
        for layer in range(self.num_layers):
            embed0 = layer == 0 and w2b is not None
            statics = (layer, Ep, U, S, n_rank, eb, embed0, row_specs, wr)
            x, lat_s, eA, eB = body(
                self, statics, x, eA, eB, tuple(scalar_blocks), sh_p, offs, win
            )
            scalar_blocks.append(lat_s)
        # blocks stay PADDED [Ep, S]: the fused readout stage consumes them
        # directly (padded rows are exactly zero — bias-free MLPs on zero
        # inputs); non-fused consumers trim to the edge count themselves
        return tuple(scalar_blocks)

    def _mega_layer_body(self, statics, x, eA, eB, scalars_tuple, sh_p, offs, win):
        layer, Ep, U, S, n_rank, eb, embed0, row_specs, wr = statics
        wexp_dtype = (
            jnp.dtype(self.tensor_dtype) if self.tensor_dtype is not None else None
        )
        from ..ops.fused_primitives import (
            gather_tp_embed_infer,
            gather_tp_infer,
            mega_latent_env,
        )

        wk, entries, dims, dim_to_irr = self.tps[layer].fused_infer_parts(x.dtype)
        # split the leading-0e scalar block out as a SECOND kernel output:
        # consumers read [Ep, U] instead of slicing the full [Ep, d3*U], and
        # the backward folds the two cotangents in VMEM (kills the pad+add
        # fusion + slice glue XLA otherwise pays, ~0.7 ms/step at 4k atoms)
        split = dims[2] > 1
        sdt = jnp.dtype(self.param_dtype)
        if embed0:
            # x is the [Ep, n_irr*U] two-body channel weights; x0 is built
            # in-kernel from (sh, x) per row_specs
            out_dtype = wexp_dtype or jnp.dtype(self.param_dtype)
            res = gather_tp_embed_infer(
                sh_p, x, eA, eB, wk, offs, win, tuple(entries), tuple(dims),
                U, eb, n_rank, row_specs, out_dtype, self.onehot_passes,
                split, sdt, wr,
            )
        else:
            res = gather_tp_infer(
                x, eA, eB, wk, offs, win, tuple(entries), tuple(dims), U, eb,
                n_rank, self.onehot_passes, split, sdt, wr,
            )
        if split:
            feats, tp_scalars = res
            tp_scalars = tp_scalars.astype(self.param_dtype)
        else:
            feats = res
            tp_scalars = feats[:, :U].astype(self.param_dtype)
        last = layer == self.num_layers - 1
        if last:
            lat_s = self.latents[layer](list(scalars_tuple) + [tp_scalars])
            eA_n, eB_n = eA, eB  # unused afterwards; keep a uniform signature
        else:
            w0, w1 = self.latents[layer](
                list(scalars_tuple) + [tp_scalars], return_weights=True
            )
            lat_s, eA_n, eB_n = mega_latent_env(
                tuple(scalars_tuple) + (tp_scalars,), sh_p, w0, w1, offs, win,
                tuple(dim_to_irr), U, eb, n_rank, S, wexp_dtype,
                self._mlp_passes(), self.onehot_passes, wr,
            )
        if self.tensor_dtype is not None:
            feats = feats.astype(jnp.dtype(self.tensor_dtype))
        return feats, lat_s, eA_n, eB_n

    def _layer_body(self, statics, features, env_w, scalars_tuple, sh_p, centers_p):
        layer, mode, E, U, Ep, n_atoms, n_rank, wr = statics
        packed = mode == "packed"
        if mode == "fused":
            offs, win = centers_p
            n_irr = len(Irreps(self.irreps_sh))
            wexp = env_w if env_w.shape[0] == Ep else jnp.pad(
                env_w, ((0, Ep - E), (0, 0))
            )
            if not self.weight_individual_irreps:
                # one weight per channel, shared across irreps
                wexp = jnp.tile(wexp, (1, n_irr))
            if self.tensor_dtype is not None:
                wexp = wexp.astype(jnp.dtype(self.tensor_dtype))
            # else: env weights arrive irrep-major [E, n_irr*U] (the shared
            # MakeWeightedChannels convention) — exactly the U-wide per-irrep
            # lane blocks the kernels slice; no transpose on the hot path
            feats = self.tps[layer].fused_call(
                features, sh_p, wexp, offs, win, n_rank,
                self.fused_block_edges or FUSED_BLOCK_EDGES, wr,
            )
            tp_scalars = feats[:, :U][:E].astype(self.param_dtype)
        elif packed:
            env_w_p = env_w if env_w.shape[0] == Ep else jnp.pad(
                env_w, ((0, Ep - E), (0, 0))
            )
            if (self.packed_env_variant or PACKED_ENV_VARIANT) == "dim_major":
                x2_dm = self._env_weighter.dim_major(sh_p, env_w_p)
                feats = self.tps[layer].packed_call(
                    features, x2_dm, centers_p, n_atoms, mul=U
                )
            else:  # edge_major: one big scatter, then a transpose-pack
                weighted_sh = self._env_weighter(sh_p, env_w_p)  # [Ep, U, d]
                feats = self.tps[layer].packed_call_edge_major(
                    features, weighted_sh, centers_p, n_atoms
                )
            tp_scalars = feats[0].reshape(-1, U)[:E]  # [E, mul]
        else:
            weighted_sh = self._env_weighter(sh_p, env_w)  # [E, mul, dim_sh]
            feats = self.tps[layer](features, weighted_sh, centers_p, n_atoms)
            tp_scalars = feats[:, :, 0]  # leading 0e per channel
        # densenet latent input: pass the pieces, not a materialized concat
        # (ScalarMLP splits its first matmul over row blocks of w0)
        lat = self.latents[layer](list(scalars_tuple) + [tp_scalars])
        return feats, lat

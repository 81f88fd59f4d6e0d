"""Model builders: config-facing functions composing the module chain.

Mirrors the reference builder surface (``allegro/model/allegro_models.py``):

- ``FullAllegroEnergyModel``: explicit-irreps builder chaining
  edge normalization → radial-chemical embed → scalar-embed MLP →
  SH tensor embed → Allegro layers → edge readout →
  edgewise reduce (× 1/sqrt(2·avg_num_neighbors)) → per-type scale/shift →
  optional pair potential → atomwise reduce (``:112-300``).
- ``AllegroEnergyModel``: derives SH irreps (p = (-1)^l) and the
  tensor-track allowed irreps from ``l_max``/``parity`` (``:70-92``).
- ``AllegroModel`` / ``FullAllegroModel``: + force/stress autodiff outputs
  (``:101-103,303-305``).

Hyperparameter names match the reference docstring (``:34-67``) so reference
configs translate 1:1. Builders return a :class:`Model` — an immutable bundle
of the flax module, dtype policy, and jit-ready ``init`` / ``apply`` /
``apply_with_derivatives`` functions.
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Any, Callable, Dict, Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..data import keys
from ..lib.irreps import Irreps
from ..nn import (
    AllegroLayers,
    AtomwiseReduce,
    EdgeLengthNormalizer,
    EdgewiseReduce,
    PerTypeScaleShift,
    ScalarMLP,
    SequentialGraphNet,
    TwoBodyBesselScalarEmbed,
    TwoBodySplineScalarEmbed,
    TwoBodySphericalHarmonicTensorEmbed,
    ZBLPairPotential,
    force_stress_wrapper,
)

NONLINEARITIES = {
    "silu": nn.silu,
    "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
    "gelu": nn.gelu,
    None: None,
    "none": None,
}

MODEL_BUILDERS: Dict[str, Callable] = {}


def model_builder(fn: Callable) -> Callable:
    """Register a config-facing builder (role of nequip's ``@model_builder``;
    ``seed``/``model_dtype`` handling lives in :class:`Model`)."""
    MODEL_BUILDERS[fn.__name__] = fn
    MODEL_BUILDERS[f"allegro_tpu.model.{fn.__name__}"] = fn
    return fn


class FieldMLP(nn.Module):
    """Apply a ScalarMLP to one field of the data dict."""

    field: str
    out_field: str
    output_dim: int
    hidden_dims: Sequence[int] = ()
    nonlinearity: Optional[Callable] = nn.silu
    param_dtype: jnp.dtype = jnp.float32
    precision: Optional[str] = "highest"

    @nn.compact
    def __call__(self, data: Dict) -> Dict:
        out = dict(data)
        out[self.out_field] = ScalarMLP(
            self.output_dim,
            hidden_dims=tuple(self.hidden_dims),
            nonlinearity=self.nonlinearity,
            name="mlp",
            param_dtype=self.param_dtype,
            precision=self.precision,
        )(data[self.field])
        return out


class FusedEdgeReadoutSum(nn.Module):
    """``edge_readout`` + ``edge_sum`` as ONE stage for the inference backend:
    when the fused statics are armed, the readout MLP and the edges→atoms
    energy scatter run as a single Pallas kernel (hidden activation and
    per-edge energies never exist in HBM — reference chain
    ``allegro/model/allegro_models.py:238-248``); otherwise it falls back to
    the exact XLA chain. The edgewise numerics ``factor`` is folded into the
    MLP's last weight matrix (``ScalarMLP.out_col_scale`` — exact by
    linearity). Param pytree identical to ``FieldMLP`` (inner module named
    ``mlp``); the replaced ``EdgewiseReduce`` was stateless."""

    hidden_dims: Sequence[int] = ()
    nonlinearity: Optional[Callable] = nn.silu
    param_dtype: jnp.dtype = jnp.float32
    precision: Optional[str] = "highest"
    factor: Optional[float] = None
    # model-level kernel selection (serialized via builder kwargs); None =
    # the process default (env ALLEGRO_NO_FUSED_READOUT kill-switch)
    use_fused: Optional[bool] = None

    @nn.compact
    def __call__(self, data: Dict) -> Dict:
        mlp = ScalarMLP(
            1,
            hidden_dims=tuple(self.hidden_dims),
            nonlinearity=self.nonlinearity,
            name="mlp",
            param_dtype=self.param_dtype,
            precision=self.precision,
            out_col_scale=None if self.factor is None else (0, self.factor),
        )
        blocks = data[keys.EDGE_SCALARS]
        pieces = tuple(blocks) if isinstance(blocks, (tuple, list)) else (blocks,)
        n_atoms = data[keys.POSITIONS].shape[0]
        fused_ok = (
            keys.FUSED_OFFS in data
            and keys.CENTER_RANK_IDENTITY in data
            and len(self.hidden_dims) <= 1
            and self.nonlinearity is nn.silu
            # model kwarg wins; env ALLEGRO_NO_FUSED_READOUT is the process-
            # default kill-switch (ablation + bench fallback when Mosaic
            # rejects the kernel)
            and (
                self.use_fused
                if self.use_fused is not None
                else os.environ.get("ALLEGRO_NO_FUSED_READOUT") != "1"
            )
        )
        out = dict(data)
        if fused_ok:
            from ..ops.fused_primitives import readout_sum_infer
            from ..ops.fused_tp import num_rank_rows

            offs, win = data[keys.FUSED_OFFS], data[keys.FUSED_WIN]
            eb = offs.shape[1]
            Ep = offs.shape[0] // 8 * eb
            wr = data[keys.FUSED_WR].shape[0] if keys.FUSED_WR in data else None
            pieces = tuple(
                p if p.shape[0] == Ep else jnp.pad(
                    p, ((0, Ep - p.shape[0]), (0, 0))
                )
                for p in pieces
            )
            n_hidden = len(self.hidden_dims)
            ws = mlp(pieces, return_weights=True)
            w0 = ws[0]
            w1 = ws[1] if n_hidden else None
            per_atom = readout_sum_infer(
                pieces, w0, w1, offs, win, eb,
                num_rank_rows(n_atoms, wr or eb), n_atoms, n_hidden,
                3 if self.precision == "high" else 6, wr,
            )
            out[keys.PER_ATOM_ENERGY] = per_atom.astype(self.param_dtype)
            return out
        # exact XLA fallback (training-capable; identical math)
        E = data[keys.EDGE_INDEX].shape[1]
        pieces = tuple(p[:E] for p in pieces)
        edge_e = mlp(list(pieces))
        out[keys.EDGE_ENERGY] = edge_e
        return EdgewiseReduce(
            field=keys.EDGE_ENERGY, out_field=keys.PER_ATOM_ENERGY, factor=None
        )(out)


@dataclasses.dataclass(frozen=True)
class Model:
    """A built model: flax module + dtype policy + ready-to-jit callables."""

    module: nn.Module
    model_dtype: jnp.dtype
    config: Dict[str, Any]
    has_derivatives: bool = True
    # rematerialize the whole energy evaluation inside the force VJP
    # (jax.nn.grad checkpoint_energy) — with per-layer remat this is what
    # fits 100k-atom force calls on one 16 GB chip
    checkpoint_energy: bool = False
    # full builder kwargs — lets model modifiers rebuild with changed fields
    # while the parameter pytree stays identical (reference analogue:
    # replace_submodules + load_state_dict, _contract.py:277,305-306)
    builder_kwargs: Optional[Dict[str, Any]] = None

    def init(self, seed: int, example_data: Dict):
        # ONE jitted init program instead of flax's eager trace: eager init
        # dispatches ~160 tiny pjit compiles (one per initializer/setup op —
        # ~90 s over a remote-tunnel backend, measured r5). Under jit the
        # forward body is dead-code-eliminated at the jaxpr level (only the
        # params are outputs), the whole thing compiles once, and the
        # persistent XLA cache makes repeat inits milliseconds.
        return jax.jit(self.module.init)(jax.random.PRNGKey(seed), example_data)

    def precompute_statics(self, data: Dict) -> Dict:
        """Attach position-INdependent per-edge arrays to a batch, on host.

        These depend only on the neighbor list (edge_index + atom types), so
        recomputing them inside every jitted force call wastes step time on
        TPU row gathers (~2 ms/step at 100k edges). Call once per neighbor
        list (MD re-neighboring does this automatically); the model falls
        back to in-graph computation when the keys are absent. Attaches:

        - ``EDGE_TYPE`` = center_type * num_types + neighbor_type
        - the fused-kernel block plan (``FUSED_OFFS``/``FUSED_WIN``) for
          fused backends — also validates the sorted-centers invariant the
          fused kernels require (edges non-decreasing in ``edge_index[0]``).
        """
        out = dict(data)
        num_types = len(self.config["type_names"])
        # ONE host readback for the two arrays this needs, then pure numpy:
        # per-array np.asarray on a remote-tunnel backend pays a round trip
        # (and an eager slice compile) EACH — ~90 s per call, measured r5.
        ei, types = jax.device_get((data[keys.EDGE_INDEX], data[keys.ATOM_TYPES]))
        ei = np.asarray(ei)
        types = np.asarray(types)
        centers = ei[0]
        neighbors = ei[1]
        n_atoms = types.shape[0]
        ct = types[np.clip(centers, 0, n_atoms - 1)]
        nt = types[np.clip(neighbors, 0, n_atoms - 1)]
        out[keys.EDGE_TYPE] = (ct * num_types + nt).astype(np.int32)
        backend = (self.builder_kwargs or {}).get("tp_kernel_backend")
        if backend in ("fused", "fused_infer"):
            from ..nn.allegro import FUSED_BLOCK_EDGES, WINDOW_ROWS
            from ..ops.fused_tp import make_block_plan_np

            eb = (
                (self.builder_kwargs or {}).get("fused_block_edges")
                or FUSED_BLOCK_EDGES
            )
            # narrow-window plan (wr < eb): every one-hot window product in
            # the kernels runs as ONE <=128-row MXU operand, and big eb
            # amortizes the per-grid-step cost (eb=512/wr=64 measured 1.27x
            # over eb=128 classic on v5e at flagship density). Validity
            # depends on the edge distribution — fall back to the classic
            # wr = eb plan (always valid) when the host validator rejects.
            wr = (self.builder_kwargs or {}).get("window_rows")
            if wr is None:
                wr = WINDOW_ROWS
            if wr and not (0 < wr < eb):
                wr = None
            try:
                win, offs, Ep = make_block_plan_np(centers, eb, n_atoms, wr=wr)
            except ValueError:
                wr = None
                win, offs, Ep = make_block_plan_np(centers, eb, n_atoms)
            out[keys.FUSED_OFFS] = offs
            out[keys.FUSED_WIN] = win
            if wr:
                # wr rides the SHAPE of a tiny static array (absent = eb)
                out[keys.FUSED_WR] = np.zeros((wr,), np.int32)
                # classic twin plan for the center ops (lane-axis windows:
                # a wr < 128 lane block is tile-illegal on TPU)
                win_c, offs_c, _ = make_block_plan_np(centers, eb, n_atoms)
                out[keys.FUSED_OFFS_EB] = offs_c
                out[keys.FUSED_WIN_EB] = win_c
            real = centers[centers < n_atoms]
            if real.size and np.array_equal(
                np.unique(real), np.arange(int(real.max()) + 1)
            ):
                # rank row r == atom r: the rank-window kernels can serve
                # atom-indexed gather/scatter (forces, energy reduction)
                out[keys.CENTER_RANK_IDENTITY] = np.ones((), np.bool_)
            # neighbor-sorted twin plan: the NEIGHBOR side of the edge-vector
            # VJP rides the center ops via a static sort permutation — the
            # center ops always use classic (wr = eb) plans (lane-axis
            # windows), so this plan is never narrowed.
            nbr_p = np.concatenate(
                [neighbors, np.full(Ep - len(neighbors), n_atoms, neighbors.dtype)]
            ).astype(np.int64)
            order = np.argsort(nbr_p, kind="stable").astype(np.int32)
            win2, offs2, _ = make_block_plan_np(nbr_p[order], eb, n_atoms)
            out[keys.FUSED_OFFS_NBR] = offs2
            out[keys.FUSED_WIN_NBR] = win2
            out[keys.NBR_PERM] = order
            inv = np.empty_like(order)
            inv[order] = np.arange(Ep, dtype=np.int32)
            out[keys.NBR_PERM_INV] = inv
            real_n = neighbors[neighbors < n_atoms]
            if real_n.size and np.array_equal(
                np.unique(real_n), np.arange(int(real_n.max()) + 1)
            ):
                out[keys.NBR_RANK_IDENTITY] = np.ones((), np.bool_)
        return out

    def apply(self, params, data: Dict) -> Dict:
        """Energy-only forward pass."""
        return self.module.apply(params, data)

    def apply_with_derivatives(self, params, data: Dict) -> Dict:
        """Forward + forces (and stress/virial when a cell is present)."""
        return force_stress_wrapper(
            self.module.apply, checkpoint_energy=self.checkpoint_energy
        )(params, data)

    def __call__(self, params, data: Dict) -> Dict:
        if self.has_derivatives:
            return self.apply_with_derivatives(params, data)
        return self.apply(params, data)


def _per_edge_type_cutoff_matrix(
    per_edge_type_cutoff, type_names: Sequence[str], r_max: float
) -> Optional[np.ndarray]:
    """Reference config format (``Dict[str, float | Dict[str, float]]``,
    cf. ``nequip EdgeLengthNormalizer``) → dense [T, T] matrix."""
    if per_edge_type_cutoff is None:
        return None
    if isinstance(per_edge_type_cutoff, np.ndarray):
        return per_edge_type_cutoff
    T = len(type_names)
    mat = np.full((T, T), r_max, dtype=np.float64)
    for center, v in per_edge_type_cutoff.items():
        ci = list(type_names).index(center)
        if isinstance(v, dict):
            for neigh, c in v.items():
                mat[ci, list(type_names).index(neigh)] = float(c)
        else:
            mat[ci, :] = float(v)
    return mat


def _instantiate_scalar_embed(cfg, num_types: int, output_dim: int, dtype):
    """Accept a module instance or a small ``_target_``-style config dict."""
    if isinstance(cfg, nn.Module):
        return cfg
    if cfg is None:
        cfg = {"_target_": "allegro_tpu.nn.TwoBodyBesselScalarEmbed"}
    cfg = dict(cfg)
    target = cfg.pop("_target_", "allegro_tpu.nn.TwoBodyBesselScalarEmbed")
    short = target.rsplit(".", 1)[-1]
    if short == "TwoBodyBesselScalarEmbed":
        return TwoBodyBesselScalarEmbed(
            num_types=num_types,
            output_dim=output_dim,
            num_bessels=int(cfg.pop("num_bessels", 8)),
            polynomial_cutoff_p=int(cfg.pop("polynomial_cutoff_p", 6)),
            param_dtype=dtype,
        )
    if short == "TwoBodySplineScalarEmbed":
        return TwoBodySplineScalarEmbed(
            num_types=num_types,
            output_dim=output_dim,
            num_splines=int(cfg.pop("num_splines", cfg.pop("spline_grid_size", 16))),
            # integer overlap count (reference semantics, spline.py:18,43-49)
            spline_span=int(cfg.pop("spline_span", 12)),
            polynomial_cutoff_p=int(cfg.pop("polynomial_cutoff_p", 6)),
            param_dtype=dtype,
        )
    raise ValueError(f"unknown radial_chemical_embed target {target}")


@model_builder
def FullAllegroEnergyModel(
    r_max: float,
    type_names: Sequence[str],
    # irreps
    irreps_edge_sh: Union[int, str],
    tensor_track_allowed_irreps: str,
    # scalar embed
    radial_chemical_embed: Optional[Dict] = None,
    radial_chemical_embed_dim: Optional[int] = None,
    per_edge_type_cutoff: Optional[Dict] = None,
    # scalar embed MLP
    scalar_embed_mlp_hidden_layers_depth: int = 1,
    scalar_embed_mlp_hidden_layers_width: int = 64,
    scalar_embed_mlp_nonlinearity: Optional[str] = "silu",
    # allegro layers
    num_layers: int = 2,
    num_scalar_features: int = 64,
    num_tensor_features: int = 16,
    allegro_mlp_hidden_layers_depth: int = 1,
    allegro_mlp_hidden_layers_width: int = 64,
    allegro_mlp_nonlinearity: Optional[str] = "silu",
    tp_path_channel_coupling: bool = True,
    # readout
    readout_mlp_hidden_layers_depth: int = 1,
    readout_mlp_hidden_layers_width: int = 32,
    readout_mlp_nonlinearity: Optional[str] = "silu",
    # edge sum normalization
    avg_num_neighbors: Optional[float] = None,
    weight_individual_irreps: bool = True,
    # per atom energy params
    per_type_energy_scales: Optional[Union[float, Sequence[float]]] = None,
    per_type_energy_shifts: Optional[Union[float, Sequence[float]]] = None,
    per_type_energy_scales_trainable: bool = False,
    per_type_energy_shifts_trainable: bool = False,
    pair_potential: Optional[Dict] = None,
    model_dtype: str = "float32",
    tp_kernel_backend: str = "einsum",
    tp_chunk_edges: int = 0,
    remat: bool = False,
    # "bfloat16": store the per-edge tensor track bf16 between layers (fused
    # backends; f32 in-kernel compute) — ~2x less HBM traffic + 2x atom
    # ceiling at ~1e-4-level force error. None = model_dtype (exact).
    tensor_dtype: Optional[str] = None,
    # remat the whole energy evaluation in the force VJP (see Model)
    checkpoint_energy: bool = False,
    # EDGE_FEATURES layout from the tensor embed: "strided" ([E, mul, dim],
    # fastest at bench scale — XLA fuses the entry transpose) or
    # "flat_dim_major" ([E, dim*mul] — avoids the transposed 2.6 GB
    # features-cotangent relayout copy at >2M edges; the 100k-atom setting)
    features_layout: Optional[str] = None,
    # edge-block size (rank-window width) of the fused kernels; None = the
    # process-wide default (nn.allegro.FUSED_BLOCK_EDGES, env-overridable).
    # A model-level field so exported artifacts and modifier rebuilds replay
    # with the block size they were built with (VERDICT r3 #9).
    fused_block_edges: Optional[int] = None,
    # window row-block size of the fused block plan (None = the process
    # default ALLEGRO_WINDOW_ROWS, 0/unset there = the classic wr = eb).
    # wr < eb: one <=128-row MXU operand per one-hot window product; pair
    # with a big eb (512/64 measured 1.27x on v5e). Host-validated per
    # neighbor list with silent degradation to wr = eb (the wr in force
    # travels with the plan, data[FUSED_WR].shape).
    window_rows: Optional[int] = None,
    # one-hot split passes of the fused kernels' feature-track MXU
    # gather/scatter products (3 = exact f32 — the library default; 2 = the
    # reduced policy, ~7.6e-6 rel on features). None = the process default
    # (ALLEGRO_ONEHOT_PASSES env) resolved at trace time. Position gathers
    # and per-atom energy sums are pinned exact regardless of this setting.
    onehot_passes: Optional[int] = None,
    # reference default allow_tf32=false (configs/tutorial.yaml:166-167):
    # full-f32 matmuls everywhere in the model. True = fast MXU semantics.
    allow_tf32: bool = False,
    # explicit matmul precision override ("highest" = exact-f32 6-pass,
    # "high" = 3-pass bf16 split ~1e-7 rel err at half the MXU cost,
    # None = respect allow_tf32). Applies to the MLP/embed dots; the fused
    # TP kernels keep their own exact one-hot algebra.
    precision: Optional[str] = None,
    # mega-fused inference layers (latent MLP + env-weight slice + env
    # scatter as ONE kernel per layer; fused_infer backend only). A MODEL
    # setting serialized with the artifact so rebuilds/exports replay with
    # identical kernel selection (VERDICT r4 #6 — reference analogue:
    # modifier persistence, _contract.py:253-310). None = the process
    # default (env ALLEGRO_NO_MEGA is the kill-switch).
    use_mega: Optional[bool] = None,
    # fused readout+scatter kernel (fused_infer backend only); None = the
    # process default (env ALLEGRO_NO_FUSED_READOUT is the kill-switch).
    use_fused_readout: Optional[bool] = None,
    **_unused,
) -> Model:
    _kwargs = {k: v for k, v in locals().items() if k not in ("_unused",)}
    _kwargs.pop("_kwargs", None)
    dtype = {
        "float64": jnp.float64,
        "float32": jnp.float32,
        "bfloat16": jnp.bfloat16,
    }[str(model_dtype)]
    num_types = len(type_names)
    if isinstance(irreps_edge_sh, int):
        irreps_sh = Irreps.spherical_harmonics(irreps_edge_sh, p=-1)
    else:
        irreps_sh = Irreps(str(irreps_edge_sh))
    avg_n = float(avg_num_neighbors) if avg_num_neighbors is not None else 1.0
    prec = precision if precision is not None else (None if allow_tf32 else "highest")
    embed_dim = (
        int(radial_chemical_embed_dim)
        if radial_chemical_embed_dim is not None
        else num_scalar_features
    )

    layers = [
        (
            "edge_norm",
            EdgeLengthNormalizer(
                r_max=r_max,
                num_types=num_types,
                per_edge_type_cutoff=_per_edge_type_cutoff_matrix(
                    per_edge_type_cutoff, type_names, r_max
                ),
            ),
        ),
        (
            "radial_chemical_embed",
            _instantiate_scalar_embed(radial_chemical_embed, num_types, embed_dim, dtype),
        ),
        (
            "scalar_embed_mlp",
            FieldMLP(
                field=keys.EDGE_EMBEDDING,
                out_field=keys.EDGE_EMBEDDING,
                output_dim=num_scalar_features,
                hidden_dims=(scalar_embed_mlp_hidden_layers_width,)
                * scalar_embed_mlp_hidden_layers_depth,
                nonlinearity=NONLINEARITIES[scalar_embed_mlp_nonlinearity],
                param_dtype=dtype,
                precision=prec,
            ),
        ),
        (
            "tensor_embed",
            TwoBodySphericalHarmonicTensorEmbed(
                irreps_sh=str(irreps_sh), mul=num_tensor_features, param_dtype=dtype,
                # NOTE: "flat_dim_major" measured ~8% slower on v5e at bench
                # scale (XLA already fuses the [E, mul, dim] build + entry
                # transpose) but avoids a 2.6 GB cotangent relayout at 100k
                # atoms — selectable per scale
                features_layout=features_layout or "strided",
                tensor_dtype=tensor_dtype,
            ),
        ),
        (
            "allegro",
            AllegroLayers(
                irreps_sh=str(irreps_sh),
                tensor_track_allowed_irreps=str(tensor_track_allowed_irreps),
                num_layers=num_layers,
                num_scalar_features=num_scalar_features,
                num_tensor_features=num_tensor_features,
                avg_num_neighbors=avg_n,
                mlp_hidden_dims=(allegro_mlp_hidden_layers_width,)
                * allegro_mlp_hidden_layers_depth,
                tp_path_channel_coupling=tp_path_channel_coupling,
                weight_individual_irreps=weight_individual_irreps,
                param_dtype=dtype,
                tp_kernel_backend=tp_kernel_backend,
                tp_chunk_edges=tp_chunk_edges,
                remat=remat,
                precision=prec,
                tensor_dtype=tensor_dtype,
                fused_block_edges=fused_block_edges,
                onehot_passes=onehot_passes,
                use_mega=use_mega,
            ),
        ),
        # readout stage(s): fused_infer gets the single fused stage (readout
        # MLP + edges→atoms energy scatter in one kernel when statics are
        # armed; the EdgewiseReduce factor folds into the MLP's last weight
        # matrix). Other backends keep the two-stage XLA chain. Param pytree
        # identical either way ("mlp" under "edge_readout"; the reduce is
        # stateless).
        *(
            [
                (
                    "edge_readout",
                    FusedEdgeReadoutSum(
                        hidden_dims=(readout_mlp_hidden_layers_width,)
                        * readout_mlp_hidden_layers_depth,
                        nonlinearity=NONLINEARITIES[readout_mlp_nonlinearity],
                        param_dtype=dtype,
                        precision=prec,
                        factor=1.0 / math.sqrt(2.0 * avg_n),
                        use_fused=use_fused_readout,
                    ),
                )
            ]
            if tp_kernel_backend == "fused_infer"
            else [
                (
                    "edge_readout",
                    FieldMLP(
                        field=keys.EDGE_SCALARS,
                        out_field=keys.EDGE_ENERGY,
                        output_dim=1,
                        hidden_dims=(readout_mlp_hidden_layers_width,)
                        * readout_mlp_hidden_layers_depth,
                        nonlinearity=NONLINEARITIES[readout_mlp_nonlinearity],
                        param_dtype=dtype,
                        precision=prec,
                    ),
                ),
                (
                    "edge_sum",
                    EdgewiseReduce(
                        field=keys.EDGE_ENERGY,
                        out_field=keys.PER_ATOM_ENERGY,
                        factor=1.0 / math.sqrt(2.0 * avg_n),
                    ),
                ),
            ]
        ),
        (
            "per_type_scale_shift",
            PerTypeScaleShift(
                num_types=num_types,
                scales=per_type_energy_scales,
                shifts=per_type_energy_shifts,
                scales_trainable=per_type_energy_scales_trainable,
                shifts_trainable=per_type_energy_shifts_trainable,
                param_dtype=dtype,
            ),
        ),
    ]
    if pair_potential is not None:
        pp = dict(pair_potential) if isinstance(pair_potential, dict) else pair_potential
        if isinstance(pp, dict):
            target = pp.pop("_target_", "allegro_tpu.nn.ZBLPairPotential")
            assert target.rsplit(".", 1)[-1] in ("ZBL", "ZBLPairPotential"), target
            type_to_Z = pp.pop("type_to_Z", None) or pp.pop("chemical_species", None)
            if type_to_Z is not None and isinstance(type_to_Z[0], str):
                from ..data.datasets import ATOMIC_NUMBERS

                type_to_Z = [ATOMIC_NUMBERS[s] for s in type_to_Z]
            pp = ZBLPairPotential(type_to_Z=type_to_Z, r_max=r_max)
        layers.append(("pair_potential", pp))
    layers.append(("total_energy_sum", AtomwiseReduce()))

    config = dict(
        r_max=r_max,
        type_names=tuple(type_names),
        irreps_edge_sh=str(irreps_sh),
        tensor_track_allowed_irreps=str(tensor_track_allowed_irreps),
        num_layers=num_layers,
        num_scalar_features=num_scalar_features,
        num_tensor_features=num_tensor_features,
        avg_num_neighbors=avg_n,
        model_dtype=str(model_dtype),
    )
    return Model(
        module=SequentialGraphNet(layers=tuple(layers)),
        model_dtype=dtype,
        config=config,
        has_derivatives=False,
        checkpoint_energy=bool(checkpoint_energy),
        builder_kwargs=_kwargs,
    )


# --- model modifiers (role of nequip's model_modifier/replace_submodules
#     registry consumed at reference _contract.py:253-310) ---

MODEL_MODIFIERS: Dict[str, Callable] = {}


def model_modifier(fn: Callable) -> Callable:
    MODEL_MODIFIERS[fn.__name__] = fn
    return fn


def _rebuild(model: Model, **overrides) -> Model:
    assert model.builder_kwargs is not None, "model was not built by a registered builder"
    kwargs = dict(model.builder_kwargs)
    kwargs.update(overrides)
    new = FullAllegroEnergyModel(**kwargs)
    return dataclasses.replace(new, has_derivatives=model.has_derivatives)


@model_modifier
def enable_PallasContracter(model: Model) -> Model:
    """Swap the TP backend to the fused Pallas kernel (inference/MD path).
    Parameter pytree unchanged — existing checkpoints keep working."""
    return _rebuild(model, tp_kernel_backend="pallas")


@model_modifier
def enable_EinsumContracter(model: Model) -> Model:
    return _rebuild(model, tp_kernel_backend="einsum")


@model_modifier
def enable_FusedContracter(model: Model) -> Model:
    """Swap the TP backend to the second-generation fused kernels (env
    scatter/gather fused into the CG-TP — role of the reference's FlashAllegro
    and cuEq in-kernel gather). Parameter pytree unchanged."""
    return _rebuild(model, tp_kernel_backend="fused")


# reference-config compatibility aliases (``--modifiers enable_TritonContracter``
# / ``enable_CuEquivarianceContracter`` map onto the fused kernel backend —
# it covers both roles: inference-only Triton and trainable cuEq)
MODEL_MODIFIERS["enable_TritonContracter"] = enable_FusedContracter
MODEL_MODIFIERS["enable_CuEquivarianceContracter"] = enable_FusedContracter


def modify(model: Model, modifiers) -> Model:
    """Apply named modifiers (strings or {"modifier": name, ...} dicts)."""
    for m in modifiers:
        if isinstance(m, dict):
            m = m.get("modifier")
        model = MODEL_MODIFIERS[m](model)
    return model


@model_builder
def AllegroEnergyModel(l_max: int, parity: bool = True, **kwargs) -> Model:
    """Derive irreps from ``l_max``/``parity`` (reference ``:70-92``)."""
    irreps_sh = Irreps.spherical_harmonics(l_max, p=-1)
    if parity:
        allowed = Irreps([(1, (l, p)) for l in range(l_max + 1) for p in (1, -1)])
    else:
        allowed = irreps_sh
    return FullAllegroEnergyModel(
        irreps_edge_sh=str(irreps_sh),
        tensor_track_allowed_irreps=str(allowed),
        **kwargs,
    )


@model_builder
def FullAllegroModel(**kwargs) -> Model:
    m = FullAllegroEnergyModel(**kwargs)
    return dataclasses.replace(m, has_derivatives=True)


@model_builder
def AllegroModel(**kwargs) -> Model:
    m = AllegroEnergyModel(**kwargs)
    return dataclasses.replace(m, has_derivatives=True)

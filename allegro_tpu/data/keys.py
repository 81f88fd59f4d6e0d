"""Well-known field names for atomic data dicts.

Key *semantics* (not storage) follow the reference's ``AtomicDataDict``
contract enumerated in SURVEY.md §2.4 (cf. ``allegro/_compile.py:10-33``,
``allegro/model/allegro_models.py:167-295``): a flat mapping from field name
to array, with ``EDGE_INDEX`` row 0 = center/receiver atom and row 1 =
neighbor atom.

TPU-specific additions: explicit ``*_MASK`` fields (padded static shapes) and
``N_REAL_*`` counts, since XLA programs cannot carry dynamic sizes.
"""

# --- per-atom ---
POSITIONS = "pos"                     # [N, 3] float
ATOM_TYPES = "atom_types"             # [N] int32
ATOMIC_NUMBERS = "atomic_numbers"     # [N] int32
NODE_MASK = "node_mask"               # [N] bool — True for real atoms
BATCH = "batch"                       # [N] int32 — frame index per atom
FORCES = "forces"                     # [N, 3] float (target or output)
PER_ATOM_ENERGY = "atomic_energy"     # [N, 1] float

# --- per-edge ---
EDGE_INDEX = "edge_index"             # [2, E] int32 (row 0 center, row 1 neighbor)
EDGE_CELL_SHIFT = "edge_cell_shift"   # [E, 3] float — integer cell offsets
EDGE_MASK = "edge_mask"               # [E] bool — True for real edges
EDGE_VECTORS = "edge_vectors"         # [E, 3]
EDGE_LENGTH = "edge_length"           # [E, 1]
NORM_LENGTH = "norm_length"           # [E, 1] — r/r_max (per-edge-type aware)
EDGE_TYPE = "edge_type"               # [E] int32 — center_type * n_types + neighbor_type
EDGE_CUTOFF = "edge_cutoff"           # [E, 1] — smooth cutoff envelope value
EDGE_EMBEDDING = "edge_embedding"     # [E, D] — two-body scalar embedding
EDGE_ATTRS = "edge_attrs"             # [E, dim] — SH tensor basis (mul=1)
EDGE_FEATURES = "edge_features"       # [E, mul, dim] — strided tensor features
EDGE_FEATURE_WEIGHTS = "edge_feature_weights"  # [E, n_irr*mul] — the two-body
                                      # channel weights (factor form of
                                      # EDGE_FEATURES = sh ⊗ weights); the
                                      # embed-fused layer-0 kernel consumes
                                      # these and EDGE_FEATURES is DCE'd
EDGE_SCALARS = "edge_scalars"         # tuple of [E, S] blocks — scalar track
                                      # (kept unconcatenated; ScalarMLP
                                      # consumers take pieces directly)
EDGE_ENERGY = "edge_energy"           # [E, 1]

# --- precomputed per-neighbor-list statics (position-INdependent; attached
# by Model.precompute_statics once per neighbor list so the jitted force
# step doesn't re-derive them every MD step) ---
FUSED_OFFS = "fused_offs"             # [NB*8, eb] int32 — fused-kernel block plan
FUSED_WIN = "fused_win"               # [NB] int32 — fused-kernel window indices
FUSED_WR = "fused_wr"                 # [wr] int32 zeros — window row-block size
#   encoded in the SHAPE (static at trace time); absent → wr = eb. Travels
#   WITH the plan arrays so a narrow-window plan can never be misread by a
#   model traced for the classic one.
FUSED_OFFS_EB = "fused_offs_eb"       # classic (wr = eb) twin plan, present
FUSED_WIN_EB = "fused_win_eb"         # only when FUSED_WR is armed: the
#   center ops put windows on the LANE axis, where a wr < 128 block is
#   tile-illegal on TPU — they always ride the classic plan.
# presence marker (value unused): edge centers cover atoms 0..max contiguously,
# so rank row r == atom r and the rank-window kernels can serve atom-indexed
# gather/scatter (forces accumulation, energy reduction)
CENTER_RANK_IDENTITY = "center_rank_identity"
# neighbor-sorted twin plan: block plan over edges re-sorted by NEIGHBOR atom
# plus the (static) sorting permutation and its inverse. Routes the
# neighbor-side of the edge-vector VJP (force accumulation at the neighbor
# atom) through the rank-window kernels instead of an XLA row scatter-add
# (~0.7 ms/step at production edge counts). Valid when neighbors also cover
# atoms 0..max contiguously (marker key NBR_RANK_IDENTITY, value unused).
FUSED_OFFS_NBR = "fused_offs_nbr"     # [NB*8, eb] int32
FUSED_WIN_NBR = "fused_win_nbr"       # [NB] int32
NBR_PERM = "nbr_perm"                 # [Ep] int32 — center-order → nbr-sorted
NBR_PERM_INV = "nbr_perm_inv"         # [Ep] int32 — inverse permutation
NBR_RANK_IDENTITY = "nbr_rank_identity"

# --- per-frame ---
CELL = "cell"                         # [F, 3, 3] float (rows are lattice vectors)
PBC = "pbc"                           # [F, 3] bool
TOTAL_ENERGY = "total_energy"         # [F, 1]
STRESS = "stress"                     # [F, 3, 3]
VIRIAL = "virial"                     # [F, 3, 3]
NUM_NODES = "num_nodes"               # [F] int32 — real atoms per frame
FRAME_MASK = "frame_mask"             # [F] bool — True for real frames

ALL_KEYS = [v for k, v in list(globals().items()) if k.isupper() and isinstance(v, str)]

# Fields that are per-atom / per-edge / per-frame (used by padding & batching).
PER_ATOM_FIELDS = {
    POSITIONS,
    ATOM_TYPES,
    ATOMIC_NUMBERS,
    NODE_MASK,
    BATCH,
    FORCES,
    PER_ATOM_ENERGY,
}
PER_EDGE_FIELDS = {
    EDGE_INDEX,
    EDGE_CELL_SHIFT,
    EDGE_MASK,
    EDGE_VECTORS,
    EDGE_LENGTH,
    NORM_LENGTH,
    EDGE_TYPE,
    EDGE_CUTOFF,
    EDGE_EMBEDDING,
    EDGE_ATTRS,
    EDGE_FEATURES,
    EDGE_SCALARS,
    EDGE_ENERGY,
}
PER_FRAME_FIELDS = {
    CELL,
    PBC,
    TOTAL_ENERGY,
    STRESS,
    VIRIAL,
    NUM_NODES,
    FRAME_MASK,
}

"""Pallas TPU kernels for the hot ops.

TPU-native counterpart of the reference's kernel back-ends (SURVEY.md §2.2):
the Triton "FlashAllegro" kernels (``allegro/nn/_strided/_flashallegro.py``)
and the cuEquivariance segmented-TP CUDA library
(``allegro/nn/_strided/_cueq_contracter.py``) are replaced by a fused
sparse Clebsch–Gordan contraction kernel with a custom VJP built on the same
index-permutation trick the Triton backward uses
(``_flashallegro.py:348-360``).
"""

from .pallas_contract import (
    tp_contract,
    tp_gradw,
    pack_edge_major,
    unpack_dim_major,
    sparse_entries,
    PallasTPBackend,
)

__all__ = [
    "tp_contract",
    "tp_gradw",
    "pack_edge_major",
    "unpack_dim_major",
    "sparse_entries",
    "PallasTPBackend",
]

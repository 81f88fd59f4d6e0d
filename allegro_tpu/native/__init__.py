"""Native (C++) runtime components, loaded via ctypes.

Built on first use with the system C++ toolchain from ``csrc/`` into a cached
shared library. Everything here has a pure-Python fallback — the native layer
accelerates host-side runtime work (neighbor lists for MD re-neighboring),
the role the reference delegates to LAMMPS/nequip C++ machinery.
"""

from .neighborlist import native_neighbor_list, native_available

__all__ = ["native_neighbor_list", "native_available"]

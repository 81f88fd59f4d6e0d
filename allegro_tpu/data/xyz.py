"""Extended-XYZ reader (self-contained; ASE-compatible subset).

The reference stack reads training data through ase/nequip datamodules;
this covers the ubiquitous ``.xyz``/``.extxyz`` interchange format: per-frame
``Lattice="..."``, ``Properties=species:S:1:pos:R:3[:forces:R:3...]``, and
an ``energy=...`` comment field.
"""

from __future__ import annotations

import re
import shlex
from typing import Dict, List, Optional

import numpy as np

from . import keys
from .datasets import ATOMIC_NUMBERS, InMemoryDataset


def _parse_comment(line: str) -> Dict[str, str]:
    out = {}
    for tok in shlex.split(line):
        if "=" in tok:
            k, v = tok.split("=", 1)
            out[k] = v
    return out


def read_extxyz(path: str, limit: Optional[int] = None) -> List[Dict[str, np.ndarray]]:
    """Parse an (ext)xyz file into a list of frame dicts."""
    frames = []
    with open(path) as f:
        while True:
            header = f.readline()
            if not header.strip():
                break
            n = int(header)
            info = _parse_comment(f.readline())
            props = info.get("Properties", "species:S:1:pos:R:3")
            fields = props.split(":")
            cols = []
            i = 0
            while i + 2 < len(fields) + 1 and i < len(fields):
                name, kind, width = fields[i], fields[i + 1], int(fields[i + 2])
                cols.append((name, kind, width))
                i += 3
            rows = [f.readline().split() for _ in range(n)]
            frame: Dict[str, np.ndarray] = {}
            c0 = 0
            for name, kind, width in cols:
                block = [r[c0 : c0 + width] for r in rows]
                c0 += width
                if name == "species":
                    syms = [s[0] for s in block]
                    if all(s in ATOMIC_NUMBERS for s in syms):
                        frame[keys.ATOMIC_NUMBERS] = np.array(
                            [ATOMIC_NUMBERS[s] for s in syms], dtype=np.int32
                        )
                    else:
                        # non-chemical species labels (e.g. generic type names):
                        # map to contiguous type indices in order of appearance
                        seen: Dict[str, int] = {}
                        for s in syms:
                            seen.setdefault(s, len(seen))
                        frame[keys.ATOM_TYPES] = np.array(
                            [seen[s] for s in syms], dtype=np.int32
                        )
                        frame["_species"] = list(seen)
                elif name == "pos":
                    frame[keys.POSITIONS] = np.array(block, dtype=np.float64)
                elif name in ("forces", "force"):
                    frame[keys.FORCES] = np.array(block, dtype=np.float64)
            if "Lattice" in info:
                cell = np.fromstring(info["Lattice"].strip('"'), sep=" ").reshape(3, 3)
                frame[keys.CELL] = cell
                pbc_s = info.get("pbc", "T T T").strip('"').split()
                frame[keys.PBC] = np.array([p in ("T", "True", "1") for p in pbc_s])
            for k in ("energy", "Energy", "total_energy"):
                if k in info:
                    frame[keys.TOTAL_ENERGY] = np.array([float(info[k])])
                    break
            frames.append(frame)
            if limit is not None and len(frames) >= limit:
                break
    return frames


def extxyz_dataset(
    path: str,
    r_max: float,
    type_names=None,
    n_frames: Optional[int] = None,
) -> InMemoryDataset:
    frames = read_extxyz(path, limit=n_frames)
    if type_names is None:
        from .datasets import CHEMICAL_SYMBOLS

        zs = sorted({int(z) for fr in frames for z in fr[keys.ATOMIC_NUMBERS]})
        type_names = [CHEMICAL_SYMBOLS[z] for z in zs]
    return InMemoryDataset(frames, r_max, type_names=type_names)


def write_extxyz(path: str, frames: List[Dict[str, np.ndarray]], type_names=None) -> None:
    """Write frames back out (round-trip support, trajectory dumps)."""
    from .datasets import CHEMICAL_SYMBOLS

    with open(path, "w") as f:
        for fr in frames:
            pos = np.asarray(fr[keys.POSITIONS])
            n = len(pos)
            if keys.ATOMIC_NUMBERS in fr:
                syms = [CHEMICAL_SYMBOLS[int(z)] for z in fr[keys.ATOMIC_NUMBERS]]
            else:
                syms = [type_names[int(t)] for t in fr[keys.ATOM_TYPES]]
            info = []
            props = "Properties=species:S:1:pos:R:3"
            has_forces = keys.FORCES in fr
            if has_forces:
                props += ":forces:R:3"
            info.append(props)
            if keys.CELL in fr:
                cell = np.asarray(fr[keys.CELL]).reshape(3, 3)
                info.insert(0, 'Lattice="' + " ".join(f"{x:.10g}" for x in cell.ravel()) + '"')
                pbc = np.asarray(fr.get(keys.PBC, np.ones(3, bool))).reshape(3)
                info.append('pbc="' + " ".join("T" if p else "F" for p in pbc) + '"')
            if keys.TOTAL_ENERGY in fr:
                info.append(f"energy={float(np.asarray(fr[keys.TOTAL_ENERGY]).sum()):.10g}")
            f.write(f"{n}\n{' '.join(info)}\n")
            forces = np.asarray(fr[keys.FORCES]) if has_forces else None
            for i in range(n):
                row = f"{syms[i]} " + " ".join(f"{x:.10g}" for x in pos[i])
                if forces is not None:
                    row += " " + " ".join(f"{x:.10g}" for x in forces[i])
                f.write(row + "\n")

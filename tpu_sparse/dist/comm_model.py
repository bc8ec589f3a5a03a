"""Measured communication-volume model for distributed SpMV/Krylov.

Wall-clock "weak-scaling efficiency" on a virtual CPU mesh is noise (N
virtual devices time-share a few host cores), so this module measures the
thing that IS exact there: the communication structure. The compiled HLO
of a distributed program names every collective with its per-shard shape;
we count them — total, and inside while-loop bodies (= per solver
iteration) — and combine the measured byte volumes with a published
hardware model (TPU v5e HBM / ICI) into a modeled weak-scaling efficiency
for real multi-chip topologies.

This replaces the reference-free part of the north-star metric
(BASELINE.md: weak-scaling nnz/s efficiency >= 0.7 from 1 chip to >= 2
hosts on a 27-point 3-D Poisson system with >100M nnz): the collective
counts/bytes are measured facts; only the link speeds are modeled.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Callable, Dict, List, Optional

import jax

# bytes per element for HLO shape parsing
_DTYPE_BYTES = {
    "f64": 8, "u64": 8, "s64": 8, "c64": 8,
    "f32": 4, "u32": 4, "s32": 4,
    "bf16": 2, "f16": 2, "u16": 2, "s16": 2,
    "pred": 1, "u8": 1, "s8": 1,
}

_COLLECTIVE_KINDS = (
    "all-reduce", "all-gather", "collective-permute", "reduce-scatter",
    "all-to-all",
)

_SHAPE_RE = re.compile(r"\b([a-z]+\d*)\[([\d,]*)\]")
# result type = everything between '= ' and the op name
_OP_RE = re.compile(
    r"=\s+(.*?)\s+(" + "|".join(_COLLECTIVE_KINDS) + r")(-start)?\(")
_WHILE_BODY_RE = re.compile(r"\bwhile\(.*body=\s*%?([\w.\-]+)")
_COMPUTATION_START_RE = re.compile(r"^(?:ENTRY\s+)?%?([\w.\-]+)\s*(?:\()")


@dataclasses.dataclass
class CollectiveOp:
    kind: str          # all-reduce / all-gather / collective-permute / ...
    bytes: int         # per-shard result bytes (full gathered size for AG)
    computation: str   # HLO computation the op appears in
    in_loop_body: bool  # inside a while-loop body => executes per iteration


@dataclasses.dataclass
class CollectiveStats:
    ops: List[CollectiveOp]

    @property
    def per_iteration(self) -> List[CollectiveOp]:
        return [o for o in self.ops if o.in_loop_body]

    @property
    def setup(self) -> List[CollectiveOp]:
        return [o for o in self.ops if not o.in_loop_body]

    def summary(self, per_iteration: Optional[bool] = None
                ) -> Dict[str, Dict[str, int]]:
        """{kind: {count, bytes}} over all ops / loop-body ops / setup."""
        if per_iteration is None:
            sel = self.ops
        elif per_iteration:
            sel = self.per_iteration
        else:
            sel = self.setup
        out: Dict[str, Dict[str, int]] = {}
        for o in sel:
            d = out.setdefault(o.kind, {"count": 0, "bytes": 0})
            d["count"] += 1
            d["bytes"] += o.bytes
        return out


def _shape_bytes(type_str: str) -> int:
    """Sum bytes over every array shape in an HLO result type (handles
    tuples like '(f32[16]{0}, u32[])')."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(type_str):
        if dtype not in _DTYPE_BYTES:
            continue
        elems = 1
        if dims:
            for d in dims.split(","):
                elems *= int(d)
        total += elems * _DTYPE_BYTES[dtype]
    return total


def hlo_collective_stats(hlo_text: str) -> CollectiveStats:
    """Parse optimized HLO text into per-collective byte counts.

    Ops inside while-loop *body* computations are flagged per-iteration.
    Async pairs (all-reduce-start / -done) count once (the -start).

    Known limits (acceptable for the programs this models, and pinned by
    tests/test_dist.py's exact per-iteration counts): (1) only ops
    LEXICALLY inside a while-body computation are classified
    per-iteration — a collective in a computation the body merely calls
    would count as setup; the repo's solver programs keep their
    collectives at body top level after XLA inlining. (2) ``-start`` ops
    parse the full tuple result type, so an async op whose tuple carries
    both operand and result shapes is counted at up to 2x its wire
    bytes; the distributed solvers' collectives all lower to the
    synchronous forms on the CPU mesh where this model is measured."""
    body_names = set(_WHILE_BODY_RE.findall(hlo_text))
    ops: List[CollectiveOp] = []
    current = ""
    for line in hlo_text.splitlines():
        if line and not line[0].isspace():
            m = _COMPUTATION_START_RE.match(line.strip())
            if m:
                current = m.group(1)
            continue
        m = _OP_RE.search(line)
        if not m:
            continue
        type_str, kind = m.group(1), m.group(2)
        ops.append(CollectiveOp(
            kind=kind, bytes=_shape_bytes(type_str), computation=current,
            in_loop_body=current in body_names))
    return CollectiveStats(ops)


def measure_collectives(fn: Callable, *args, **kwargs) -> CollectiveStats:
    """Compile fn(*args) (jit if not already) and return its collective
    stats. Runs entirely at compile time — nothing executes on devices."""
    jitted = fn if hasattr(fn, "lower") else jax.jit(fn)
    compiled = jitted.lower(*args, **kwargs).compile()
    return hlo_collective_stats(compiled.as_text())


# -- hardware model ---------------------------------------------------------


@dataclasses.dataclass
class HardwareModel:
    """TPU v5e defaults (public numbers; see jax-ml.github.io/scaling-book):
    one-way ICI bandwidth ~45 GB/s per link, 1-D ring uses 2 links; HBM
    ~820 GB/s; per-hop ICI latency ~1 us. mesh_dims models the physical
    torus for reduction-latency hops (a 4x4 v5e slice reduces over two
    axes of 4, not one ring of 16)."""

    hbm_gbs: float = 820.0
    ici_link_gbs: float = 45.0
    ici_links: int = 2            # links usable by the 1-D ring layout
    hop_latency_us: float = 1.0

    @property
    def ici_gbs(self) -> float:
        return self.ici_link_gbs * self.ici_links


def _reduction_hops(n_dev: int, mesh_dims: Optional[tuple]) -> int:
    """Ring all-reduce hop count: 2(N-1) on one ring; on a multi-axis
    torus the reduction runs per axis: sum 2(d-1)."""
    if not mesh_dims:
        return 2 * (n_dev - 1)
    return sum(2 * (d - 1) for d in mesh_dims)


def comm_time_per_iteration(stats: CollectiveStats, n_dev: int,
                            hw: HardwareModel = HardwareModel(),
                            mesh_dims: Optional[tuple] = None) -> float:
    """Seconds of wire time per solver iteration implied by the measured
    per-iteration collectives at mesh size n_dev (ring algorithms)."""
    ici = hw.ici_gbs * 1e9
    lat = hw.hop_latency_us * 1e-6
    t = 0.0
    for op in stats.per_iteration:
        if op.kind == "collective-permute":
            t += op.bytes / ici + lat  # one hop
        elif op.kind == "all-gather":
            # op.bytes is the full gathered size; ring wire share/device
            t += op.bytes * (n_dev - 1) / n_dev / ici \
                + (n_dev - 1) * lat
        elif op.kind == "all-reduce":
            hops = _reduction_hops(n_dev, mesh_dims)
            t += 2.0 * op.bytes * (n_dev - 1) / n_dev / ici + hops * lat
        elif op.kind == "reduce-scatter":
            t += op.bytes * (n_dev - 1) / n_dev / ici + (n_dev - 1) * lat
        elif op.kind == "all-to-all":
            t += op.bytes * (n_dev - 1) / n_dev / ici + (n_dev - 1) * lat
    return t


def modeled_weak_scaling_efficiency(
        stats: CollectiveStats, n_dev: int, local_hbm_bytes: float,
        hw: HardwareModel = HardwareModel(),
        mesh_dims: Optional[tuple] = None,
        overlap: float = 0.0) -> float:
    """Weak-scaling efficiency = t_compute / (t_compute + exposed comm).

    t_compute is the per-device HBM-bound time (local matrix + vector
    traffic); comm is the measured per-iteration collective volume timed
    on the hardware model. overlap in [0,1] is the fraction of comm hidden
    behind compute (0 = fully exposed, conservative)."""
    t_comp = local_hbm_bytes / (hw.hbm_gbs * 1e9)
    t_comm = comm_time_per_iteration(stats, n_dev, hw, mesh_dims)
    exposed = max(0.0, t_comm * (1.0 - overlap))
    return t_comp / (t_comp + exposed)


def spmv_local_hbm_bytes(nnz_local: int, rows_local: int,
                         dtype_bytes: int = 4) -> float:
    """HBM traffic of one local stencil SpMV: matrix data + read x +
    write y (+ read halo-extended x ~ x)."""
    return dtype_bytes * (nnz_local + 3 * rows_local)

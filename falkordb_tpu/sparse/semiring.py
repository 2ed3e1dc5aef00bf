"""Semiring registry for sparse graph algebra.

TPU-first design: a semiring is a pair (add-monoid, multiply-binop) plus the
additive identity.  The add monoid is realised as a `jax.ops.segment_*`
reduction over edge contributions; the multiply binop is an elementwise VPU
op over gathered operands.  This replaces the GraphBLAS semiring objects the
reference binds via FFI (reference: graph/src/graph/graphblas/matrix.rs:763
uses GxB_ANY_PAIR_BOOL for structural traversal; algo procedures use
plus_times / min_plus / plus_first variants).

Monoids are expressed as segment reductions so that the same edge-centric
kernel shape serves every semiring — the idiomatic XLA formulation (static
shapes, fused gather → elementwise → segment-reduce).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Monoids: name -> (segment_reduce_fn, identity_fn(dtype))
# ---------------------------------------------------------------------------


def _seg_sum(vals, ids, num_segments, indices_are_sorted=False):
    return jax.ops.segment_sum(
        vals, ids, num_segments=num_segments, indices_are_sorted=indices_are_sorted
    )


def _seg_min(vals, ids, num_segments, indices_are_sorted=False):
    return jax.ops.segment_min(
        vals, ids, num_segments=num_segments, indices_are_sorted=indices_are_sorted
    )


def _seg_max(vals, ids, num_segments, indices_are_sorted=False):
    return jax.ops.segment_max(
        vals, ids, num_segments=num_segments, indices_are_sorted=indices_are_sorted
    )


def _ident_zero(dtype):
    return jnp.zeros((), dtype=dtype)


def _ident_plus_inf(dtype):
    if jnp.issubdtype(dtype, jnp.floating):
        return jnp.array(jnp.inf, dtype=dtype)
    return jnp.array(jnp.iinfo(dtype).max, dtype=dtype)


def _ident_minus_inf(dtype):
    if dtype == jnp.bool_:
        return jnp.zeros((), dtype=dtype)
    if jnp.issubdtype(dtype, jnp.floating):
        return jnp.array(-jnp.inf, dtype=dtype)
    return jnp.array(jnp.iinfo(dtype).min, dtype=dtype)


MONOIDS: dict[str, tuple[Callable, Callable]] = {
    "plus": (_seg_sum, _ident_zero),
    "min": (_seg_min, _ident_plus_inf),
    "max": (_seg_max, _ident_minus_inf),
    # 'or' and 'any' both reduce with max: for bool/uint contributions max is
    # logical-or; 'any' may return an arbitrary member, max is a valid choice.
    "or": (_seg_max, _ident_zero),
    "any": (_seg_max, _ident_minus_inf),
}

# ---------------------------------------------------------------------------
# Multiply binops: name -> fn(edge_val, x_gathered) -> contribution
# `pair` ignores both values and yields 1 (structural); `first` takes the
# edge value; `second` takes the vector value.
# ---------------------------------------------------------------------------

BINOPS: dict[str, Callable] = {
    "times": lambda a, x: a * x,
    "plus": lambda a, x: a + x,
    "min": lambda a, x: jnp.minimum(a, x),
    "max": lambda a, x: jnp.maximum(a, x),
    "and": lambda a, x: jnp.logical_and(a, x),
    # `pair` is structural: it fires only where BOTH operands are present.
    # The stored edge is present by construction; the dense vector encodes
    # absence as 0 (its additive identity), so presence = (x != 0).
    "pair": lambda a, x: (x != 0),
    "first": lambda a, x: a.astype(x.dtype) if a.dtype != x.dtype else a,
    "second": lambda a, x: x,
}


@dataclasses.dataclass(frozen=True)
class Semiring:
    """An (add-monoid, mul-binop) pair over a fixed output dtype."""

    name: str
    add: str  # key into MONOIDS
    mul: str  # key into BINOPS
    dtype: Any  # output dtype

    @property
    def zero(self):
        return MONOIDS[self.add][1](self.dtype)

    def identity(self):
        return self.zero

    def segment_reduce(self, vals, ids, num_segments, indices_are_sorted=False):
        out = MONOIDS[self.add][0](
            vals, ids, num_segments, indices_are_sorted=indices_are_sorted
        )
        # XLA's segment_min/max fill receiver-less segments with the dtype
        # extremum.  For monoids whose identity is NOT that extremum ('or':
        # identity 0 but reduced with max), clamp so empty rows read as the
        # semiring identity.
        if self.add == "or":
            out = jnp.maximum(out, jnp.zeros((), dtype=out.dtype))
        return out

    def multiply(self, edge_vals, x_gathered):
        return BINOPS[self.mul](edge_vals, x_gathered)

    def combine(self, a, b):
        """Elementwise add-monoid combine of two dense results."""
        if self.add == "plus":
            return a + b
        if self.add in ("min",):
            return jnp.minimum(a, b)
        if self.add in ("max", "or", "any"):
            return jnp.maximum(a, b)
        raise ValueError(self.add)


# Structural traversal semiring — the reference's GxB_ANY_PAIR_BOOL
# (matrix.rs:763): output is "does any edge connect", values irrelevant.
# We carry it in int32 (0/1) on device: bool segment ops lower poorly and
# int32 masks compose with counting.  The add monoid is 'or' (identity 0) so
# empty rows read as absent without a separate structure mask.
ANY_PAIR_BOOL = Semiring("any_pair_bool", "or", "pair", jnp.int32)
LOR_LAND_BOOL = Semiring("lor_land_bool", "or", "and", jnp.int32)
PLUS_TIMES_F32 = Semiring("plus_times_f32", "plus", "times", jnp.float32)
PLUS_TIMES_F64 = Semiring("plus_times_f64", "plus", "times", jnp.float64)
MIN_PLUS_F32 = Semiring("min_plus_f32", "min", "plus", jnp.float32)
MAX_TIMES_F32 = Semiring("max_times_f32", "max", "times", jnp.float32)
MIN_FIRST_F32 = Semiring("min_first_f32", "min", "first", jnp.float32)
PLUS_FIRST_F32 = Semiring("plus_first_f32", "plus", "first", jnp.float32)
PLUS_PAIR_I32 = Semiring("plus_pair_i32", "plus", "pair", jnp.int32)  # degree / counting
MIN_SECOND_I32 = Semiring("min_second_i32", "min", "second", jnp.int32)  # parent propagation

_REGISTRY = {
    s.name: s
    for s in [
        ANY_PAIR_BOOL,
        LOR_LAND_BOOL,
        PLUS_TIMES_F32,
        PLUS_TIMES_F64,
        MIN_PLUS_F32,
        MAX_TIMES_F32,
        MIN_FIRST_F32,
        PLUS_FIRST_F32,
        PLUS_PAIR_I32,
        MIN_SECOND_I32,
    ]
}


def get_semiring(name: str) -> Semiring:
    return _REGISTRY[name]


def register_semiring(add: str, mul: str, dtype, name: str | None = None) -> Semiring:
    """Custom semiring registration (the reference's monoid/binop registry)."""
    name = name or f"{add}_{mul}_{jnp.dtype(dtype).name}"
    if name in _REGISTRY:
        return _REGISTRY[name]
    if add not in MONOIDS:
        raise ValueError(f"unknown monoid {add!r}; options: {sorted(MONOIDS)}")
    if mul not in BINOPS:
        raise ValueError(f"unknown binop {mul!r}; options: {sorted(BINOPS)}")
    s = Semiring(name, add, mul, dtype)
    _REGISTRY[name] = s
    return s

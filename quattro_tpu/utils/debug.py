"""Debug/validation aids: NaN guards and halo-exchange checksums.

The reference has no sanitizers — its only concurrency is process-isolated
(SURVEY.md §5.2). Our jitted collectives are deterministic, but two real debug
needs remain:
1. NaN tracking through long jitted programs (``nan_guard``).
2. Verifying that horizon-shard halo exchange delivered consistent boundary
   value functions (``halo_checksum_diff``): the element each shard RECEIVES
   must equal what its neighbor SENT — checked by an independent ppermute of
   per-shard checksums.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def nan_guard():
    """Enable jax_debug_nans within a scope (raises at the op producing NaN)."""
    with jax.debug_nans(True):
        yield


def tree_checksum(tree) -> jnp.ndarray:
    """EXACT order-independent checksum: leaf bit patterns summed modulo 2^32.

    Integer (wraparound) accumulation rather than float: a float sum rounds —
    under default config an f64 upcast silently canonicalizes back to f32, so
    a large tree's ~1e-7 relative rounding could absorb a small single-element
    corruption. Modular uint32 addition is exact, order-independent, and
    sensitive to any bit flip that doesn't exactly cancel."""
    total = jnp.uint32(0)
    for leaf in jax.tree.leaves(tree):
        x = jnp.asarray(leaf)
        if x.dtype.itemsize < 4:  # bool/int8/...: value-cast, still exact
            bits = x.astype(jnp.uint32)
        else:  # f32/f64/i32/i64: reinterpret the raw bits (f64 -> (..., 2))
            bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
        total = total + jnp.sum(bits, dtype=jnp.uint32)
    return total


def verify_halo_exchange(sent_tree, received_tree, axis: str, perm) -> jnp.ndarray:
    """Inside shard_map: validate a payload ppermute with an independent
    scalar-checksum ppermute.

    ``sent_tree`` is this shard's outgoing payload, ``received_tree`` what it
    got back from the data-path ppermute with permutation ``perm``. The
    checksum travels through its own (tiny) collective; if the data path
    corrupted or misrouted the payload the two disagree. Returns 0.0 when
    consistent, 1.0 on mismatch. Debug-only: costs one extra scalar
    collective per hop.
    """
    expected = jax.lax.ppermute(tree_checksum(sent_tree), axis, perm)
    actual = tree_checksum(received_tree)
    return jnp.where(expected == actual, 0.0, 1.0).astype(jnp.float32)

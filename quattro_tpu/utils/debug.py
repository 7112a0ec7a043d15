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
    """Order-independent float checksum of a pytree (sum of elementwise sums)."""
    leaves = jax.tree.leaves(tree)
    return sum(jnp.sum(leaf.astype(jnp.float64) if leaf.dtype == jnp.float32 else leaf)
               for leaf in leaves)


def verify_halo_exchange(sent_tree, received_tree, axis: str, perm) -> jnp.ndarray:
    """Inside shard_map: validate a payload ppermute with an independent
    scalar-checksum ppermute.

    ``sent_tree`` is this shard's outgoing payload, ``received_tree`` what it
    got back from the data-path ppermute with permutation ``perm``. The
    checksum travels through its own (tiny) collective; if the data path
    corrupted or misrouted the payload the two disagree. Returns the absolute
    difference (0.0 == consistent). Debug-only: costs one extra scalar
    collective per hop.
    """
    expected = jax.lax.ppermute(tree_checksum(sent_tree), axis, perm)
    actual = tree_checksum(received_tree)
    return jnp.abs(expected - actual)

"""JAX version compatibility shims."""

from __future__ import annotations

import jax


def shard_map(f, *, mesh, in_specs, out_specs):
    """shard_map across jax versions: new jax.shard_map(check_vma=) vs old
    jax.experimental.shard_map.shard_map(check_rep=)."""
    if hasattr(jax, "shard_map"):
        return jax.shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
    from jax.experimental.shard_map import shard_map as _sm

    return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
               check_rep=False)

"""Sharded embedding + statistics: the fused multi-chip scoring step.

This is the TPU-native replacement for the communication layer the reference
lacks (SURVEY.md §5.8): shard the batch over a 1-D mesh with shard_map, run
frontend + embedding network per shard, reduce the streaming statistics with
psum over ICI, and (optionally) finish with the on-device Fréchet epilogue —
one jitted program, no host round-trips, deterministic reduction order.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import stats as stats_ops
from .mesh import DATA_AXIS

try:  # jax >= 0.7 public API
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)

except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map_old

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_old(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)


def make_sharded_embed_stats(
    mesh: Mesh, model_fn: Callable
) -> Callable[[dict, jnp.ndarray, jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """Build fn(params, rows, mask) -> (n, s, ss), batch sharded over 'data'.

    ``rows`` [B, ...] are model inputs (patches / log-mels / waveforms),
    ``mask`` [B] zeroes padded rows. The returned statistics are psum-reduced,
    replicated on every device, and identical to the single-chip result.
    """

    def _local(params, rows, mask, shift):
        emb = model_fn(params, rows) - shift
        emb_m = emb * mask[:, None]
        n = jnp.sum(mask)
        s = jnp.sum(emb_m, axis=0)
        ss = jnp.matmul(emb_m.T, emb, preferred_element_type=jnp.float32)
        return (
            jax.lax.psum(n, DATA_AXIS),
            jax.lax.psum(s, DATA_AXIS),
            jax.lax.psum(ss, DATA_AXIS),
        )

    sharded = shard_map(
        _local,
        mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=(P(), P(), P()),
    )

    @jax.jit
    def fn(params, rows, mask, shift=None):
        if shift is None:
            shift = jnp.zeros((), jnp.float32)
        return sharded(params, rows, mask, shift)

    return fn


def make_sharded_score_step(mesh: Mesh, model_fn: Callable) -> Callable:
    """Build the full fused scoring step:

    fn(params, rows_bg, mask_bg, rows_ev, mask_ev) -> FAD scalar

    Both row sets are sharded over 'data'; statistics are psum'd; the Fréchet
    epilogue (finalize + eigh trace-sqrtm) runs replicated on device. This is
    the multi-chip production path and the dryrun_multichip target.
    """
    embed_stats = make_sharded_embed_stats(mesh, model_fn)

    @jax.jit
    def step(params, rows_bg, mask_bg, rows_ev, mask_ev):
        n1, s1, ss1 = embed_stats(params, rows_bg, mask_bg)
        n2, s2, ss2 = embed_stats(params, rows_ev, mask_ev)
        zero = jnp.zeros_like(s1)
        mu1, sig1 = stats_ops.finalize_stats(stats_ops.StreamingStats(n1, s1, ss1, zero))
        mu2, sig2 = stats_ops.finalize_stats(stats_ops.StreamingStats(n2, s2, ss2, zero))
        return stats_ops.frechet_distance_jax(mu1, sig1, mu2, sig2)

    return step

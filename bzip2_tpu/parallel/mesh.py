"""Block-data-parallel encoding over a jax.sharding.Mesh.

The block axis is sharded across the mesh ("blocks" axis); every device runs
the identical single-chip block-encode program (bzip2_tpu.engine) on its
shard, then all-gathers the per-block bit lengths so each participant knows
the global splice offsets (SURVEY §2.3's parallelism contract).  Compressed
payload words stay device-sharded until the host gathers them in block
order for the bit splice.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..engine import encode_batch_device


def make_mesh(devices=None, axis: str = "blocks") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def build_sharded_encoder(mesh: Mesh, n_words: int, axis: str = "blocks"):
    """Returns a jitted SPMD encoder over the mesh.

    fn(blocks (B, N) u8, n (B,), in_use (B,256), crc (B,)) ->
      (words (B, n_words) u32 sharded, nbits (B,) replicated)
    B must be a multiple of the mesh size.
    """

    def local_step(blocks, n, in_use, crc):
        words, nbits = encode_batch_device(blocks, n, in_use, crc,
                                           n_words=n_words)
        # All-gather the (tiny) per-block bit lengths so every shard can
        # compute global splice offsets; payloads stay sharded.
        nbits_all = jax.lax.all_gather(nbits, axis, tiled=True)
        return words, nbits_all

    # replication checking off: several ops initialize loop carries from
    # constants (e.g. the MTF last-occurrence table), which the varying-
    # manual-axes analysis would reject; per-shard semantics are unaffected.
    kw = dict(mesh=mesh, in_specs=(P(axis), P(axis), P(axis), P(axis)),
              out_specs=(P(axis), P()))
    try:
        sharded = shard_map(local_step, check_vma=False, **kw)
    except TypeError:  # older shard_map API
        sharded = shard_map(local_step, check_rep=False, **kw)
    return jax.jit(sharded)


def encode_blocks_sharded(mesh, blocks_np, n_np, in_use_np, crc_np, n_words):
    """Host convenience: pad the batch to the mesh size, run the SPMD step,
    return (words (B,W) np.uint32, nbits (B,) np.int64) for the real blocks."""
    d = mesh.devices.size
    B = blocks_np.shape[0]
    Bp = -(-B // d) * d
    if Bp != B:
        pad = Bp - B
        blocks_np = np.concatenate([blocks_np, np.zeros((pad,) + blocks_np.shape[1:], np.uint8)])
        n_np = np.concatenate([n_np, np.ones(pad, np.int32)])
        iu = np.zeros((pad, 256), bool)
        iu[:, 0] = True
        in_use_np = np.concatenate([in_use_np, iu])
        crc_np = np.concatenate([crc_np, np.zeros(pad, np.uint32)])
    fn = build_sharded_encoder(mesh, n_words)
    words, nbits = fn(blocks_np, n_np.astype(np.int32), in_use_np, crc_np)
    return np.asarray(words)[:B], np.asarray(nbits)[:B]

"""Device mesh + sharded batch rendering.

The reference's only cross-device construct is a producer/consumer queue
overlapping host decode with GPU passes (reference:
src/raw2film/gui_objects.py:65-115). The TPU-native scaling story
(SURVEY.md §2.4/§5.8): shard the *image batch* across chips over ICI with
``jax.sharding`` — and optionally shard the image rows ("space" axis) so a
single huge frame can exceed one chip's HBM; XLA's SPMD partitioner inserts
the halo exchanges the conv stages need automatically.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from raw2film_tpu.pipeline.render import RenderConfig, render_chain


def make_mesh(
    n_devices: int | None = None, batch: int | None = None, space: int | None = None
) -> Mesh:
    """Build a (batch, space) mesh. Defaults: all devices on the batch axis."""
    devices = np.asarray(jax.devices())
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(
            f"make_mesh: {n} devices requested but only {len(devices)} "
            f"available ({jax.devices()[0].platform}); for a virtual mesh set "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n} and "
            f"JAX_PLATFORMS=cpu before jax initializes backends"
        )
    devices = devices[:n]
    if batch is None and space is None:
        batch, space = n, 1
    elif batch is None:
        batch = n // space
    elif space is None:
        space = n // batch
    if batch * space != n:
        raise ValueError(
            f"make_mesh: batch*space ({batch}*{space}) must equal n devices ({n})"
        )
    return Mesh(devices.reshape(batch, space), ("batch", "space"))


def batch_render_fn(cfg: RenderConfig):
    """Batched render: (B, 3, H, W) xyz + per-image keys -> (B, 3, H, W) u8.

    Uses lax.map (a device-side loop), not vmap: the Pallas conv/grain
    kernels have fixed block layouts that don't admit a vmapped batch dim,
    and a loop has identical throughput for full-frame work.
    """

    def fn(xyz_batch, bundle, keys):
        return jax.lax.map(
            lambda xk: render_chain(xk[0], bundle, cfg, xk[1]),
            (xyz_batch, keys),
        )

    return fn


def sharded_batch_render(mesh: Mesh, cfg: RenderConfig):
    """jit the batched render with the batch axis sharded over the mesh's
    'batch' axis (each device loops its local shard) and image rows over
    'space'. Bundle arrays are replicated."""
    try:
        from jax import shard_map as _sm

        shard_map = partial(_sm, check_vma=False)
    except ImportError:  # jax < 0.8
        from jax.experimental.shard_map import shard_map as _sm

        shard_map = partial(_sm, check_rep=False)

    in_spec = P("batch", None, "space", None)
    key_spec = P("batch")
    fn = batch_render_fn(cfg)

    if mesh.shape.get("space", 1) == 1:
        body = shard_map(
            fn,
            mesh=mesh,
            in_specs=(in_spec, P(), key_spec),
            out_specs=in_spec,
        )
        return jax.jit(body)

    # With a space axis the conv halos need cross-shard exchange — delegate
    # to XLA's SPMD partitioner via shardings (vmap-free loop body). The
    # trace must use the XLA conv formulations: SPMD inserts halo exchanges
    # for lax ops but cannot partition a Pallas custom-call across devices.
    from raw2film_tpu.ops import conv as convops

    def fn_spmd(*args):
        with convops.force_xla():
            return fn(*args)

    in_shard = NamedSharding(mesh, in_spec)
    key_shard = NamedSharding(mesh, key_spec)
    repl = NamedSharding(mesh, P())
    return jax.jit(
        fn_spmd,
        in_shardings=(in_shard, repl, key_shard),
        out_shardings=in_shard,
    )

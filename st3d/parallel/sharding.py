"""Multi-chip scale-out: view-sharded data parallelism over a device mesh.

The reference is single-process single-device (SURVEY.md §2.3 — no
torch.distributed anywhere); this module is the TPU-native scaling story:
camera views shard across chips on a 1-D ``jax.sharding.Mesh`` axis
('views'), the mesh/texture parameters replicate, and gradients reduce over
ICI with ``jax.lax.pmean`` inside ``shard_map`` — XLA owns the collectives,
there is no custom communication backend to write.

``shard_map`` (not auto-partitioned jit) is used so the Pallas rasterizer
sees per-device local shapes — each chip rasterizes and VGG-encodes its own
views; only the (small) parameter gradients cross chips, riding ICI once per
step. Loss semantics are preserved exactly: every per-view loss term in this
framework is a mean over the batch axis, so pmean over equally-sized shards
equals the global-batch mean.

Tested without hardware via ``--xla_force_host_platform_device_count=8``
(SURVEY.md §4 item 6); the driver's ``dryrun_multichip`` entry also goes
through here.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


VIEW_AXIS = "views"


def make_device_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(
            f"requested {n} devices but only {len(devs)} present "
            "(for CPU testing set "
            "XLA_FLAGS=--xla_force_host_platform_device_count=N)"
        )
    return Mesh(np.array(devs[:n]), (VIEW_AXIS,))


def shard_views(tree, mesh: Mesh):
    """Place every array leaf sharded along its leading (view) axis."""
    sharding = NamedSharding(mesh, P(VIEW_AXIS))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )


def make_view_parallel_step(
    loss_fn: Callable,
    optimizer,
    mesh: Mesh,
    donate: bool = True,
    has_aux: bool = False,
):
    """Build a jitted SPMD optimization step.

    ``loss_fn(params, *view_batched_args) -> scalar`` (or ``(scalar, aux)``
    with ``has_aux=True``, where aux is view-batched) must be a mean over
    the leading view axis of each batched arg. The returned step has
    signature ``step(params, opt_state, *view_batched_args) -> (params,
    opt_state, loss[, aux])``; params/opt_state are replicated, batched args
    are sharded along 'views', gradients are pmean-reduced over ICI, and aux
    comes back view-sharded.
    """
    def _step(params, opt_state, *batched):
        if has_aux:
            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, *batched)
        else:
            loss, grads = jax.value_and_grad(loss_fn)(params, *batched)
            aux = None
        grads = jax.lax.pmean(grads, VIEW_AXIS)
        loss = jax.lax.pmean(loss, VIEW_AXIS)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u, params, updates
        )
        if has_aux:
            return params, opt_state, loss, aux
        return params, opt_state, loss

    def build(n_args: int):
        in_specs = (P(), P()) + (P(VIEW_AXIS),) * n_args
        out_specs = (P(), P(), P())
        if has_aux:
            out_specs = out_specs + (P(VIEW_AXIS),)
        sharded = jax.shard_map(
            _step, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
        return jax.jit(
            sharded, donate_argnums=(0, 1) if donate else ()
        )

    cache = {}

    def step(params, opt_state, *batched):
        key = len(batched)
        if key not in cache:
            cache[key] = build(key)
        return cache[key](params, opt_state, *batched)

    return step

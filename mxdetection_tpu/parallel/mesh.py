"""Device mesh construction — the SPMD replacement for KVStore/ps-lite.

Reference equivalent (SURVEY.md §5.8): multi-GPU KVStore ``device`` allreduce
and multi-node ``dist_sync`` over a C++ parameter server. The TPU design has
no server role: every host calls ``jax.distributed.initialize`` (multi-host),
builds one global Mesh over all devices, and gradient/stat reduction lowers
to ICI/DCN collectives inside the jitted step.

Mesh axes: ("data", "model"). Detection models here are small (<100M params)
so "model" is size 1 in every shipped config — the axis exists so tensor
parallelism can be enabled without restructuring (SURVEY.md §2.4).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(mesh_shape=(-1, 1), devices=None) -> Mesh:
    """mesh_shape: (data, model); -1 fills with remaining devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    shape = list(mesh_shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1]))
        shape[shape.index(-1)] = n // known
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    return Mesh(devices.reshape(shape), (DATA_AXIS, MODEL_AXIS))


def initialize_multihost(coordinator: str | None = None, num_processes: int | None = None,
                         process_id: int | None = None) -> None:
    """Multi-host bring-up (v5p-16 = 2 hosts x 8 chips; BASELINE configs[4]).

    On TPU pods the three arguments are auto-detected from the environment;
    they exist for explicit launchers. No-op when single-process.
    """
    if num_processes is not None and num_processes > 1 or coordinator is not None:
        # CPU backend needs an explicit cross-process collectives transport
        # (gloo ships in jaxlib); TPU backends ignore this setting. This is
        # what makes the 2-process CPU integration test possible without TPUs.
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass  # option absent on this jax version; TPU pods don't need it
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)

"""Multi-host distribution scaffolding (SURVEY.md §5.8).

The reference is single-process shared-memory (pthread barriers,
RooT_linux.cpp:547-630); the TPU framework's scale-out axis is
jax.distributed: one Python process per host, each driving its local
chips, with ICI collectives inside a global Mesh and DCN only for
process bring-up and host frame assembly.

Env-gated so single-host operation needs no configuration:

  QUADRAY_COORDINATOR=host:port   coordinator address (process 0)
  QUADRAY_NUM_PROCESSES=N         total process count
  QUADRAY_PROCESS_ID=i            this process's id

`init_distributed()` is a no-op when these are unset; all helpers then
degrade to their single-process behavior, which is how the CPU-mesh
tests exercise this module.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Dict, List, Optional

import jax
import numpy as np

from quadray_tpu.parallel.mesh import RAY_AXIS, ray_mesh

_initialized = False


def init_distributed() -> bool:
    """Initialize jax.distributed from the QUADRAY_* env (no-op without
    them). Returns True when running multi-process."""
    global _initialized
    coord = os.environ.get("QUADRAY_COORDINATOR")
    if not coord:
        return False
    if _initialized:
        return True
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(os.environ["QUADRAY_NUM_PROCESSES"]),
        process_id=int(os.environ["QUADRAY_PROCESS_ID"]))
    _initialized = True
    return True


def global_ray_mesh():
    """Mesh over every device of every process (ICI+DCN); single-process
    this is just ray_mesh()."""
    return ray_mesh(jax.devices())


def assemble_frame(img) -> np.ndarray:
    """Host frame assembly: gather a (possibly globally-sharded) rendered
    frame onto every host as numpy (the DCN analog of the reference's
    shared framebuffer rows). Single-process: a plain device->host copy."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        img = multihost_utils.process_allgather(img, tiled=True)
    return np.asarray(img)


def scaling_report(render_fn: Callable[[object], object],
                   device_counts: Optional[List[int]] = None,
                   frames: int = 3) -> Dict:
    """Scaling-efficiency harness: time `render_fn(mesh)` over meshes of
    growing device count and report throughput + parallel efficiency
    relative to the smallest mesh (north-star gate: >= 0.85 at the
    largest). render_fn must block until the frame is ready."""
    devs = jax.devices()
    if device_counts is None:
        device_counts = [n for n in (1, 2, 4, 8, 16, 32)
                         if n <= len(devs)]
    rows = []
    for n in device_counts:
        mesh = ray_mesh(devs[:n])
        render_fn(mesh)  # compile + warm
        best = float("inf")
        for _ in range(frames):
            t0 = time.perf_counter()
            render_fn(mesh)
            best = min(best, time.perf_counter() - t0)
        rows.append({"devices": n, "seconds_per_frame": best})
    base = rows[0]
    for r in rows:
        speedup = base["seconds_per_frame"] / r["seconds_per_frame"]
        r["speedup"] = speedup
        r["efficiency"] = speedup * base["devices"] / r["devices"]
    return {"process_count": jax.process_count(),
            "device_kind": devs[0].device_kind,
            "rows": rows}

"""Worker for the 2-process jax.distributed smoke test (run by
tests/test_multidevice.py::test_two_process_distributed_smoke).

Each process gets 2 virtual CPU devices -> a 4-device global mesh over
DCN; exercises the REAL multi-process code paths of
parallel/distributed.py: init_distributed, global_ray_mesh, a psum over
the global mesh, and assemble_frame's process_allgather.
"""

import os
import sys
from functools import partial

pid = int(sys.argv[1])
port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["QUADRAY_COORDINATOR"] = f"127.0.0.1:{port}"
os.environ["QUADRAY_NUM_PROCESSES"] = "2"
os.environ["QUADRAY_PROCESS_ID"] = str(pid)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# distributed init MUST precede anything that initializes the XLA
# backend — importing quadray_tpu builds jnp constants, so the raw
# initialize comes first and init_distributed() then just records it
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2,
    process_id=pid)
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import shard_map  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from quadray_tpu.parallel.distributed import (  # noqa: E402
    init_distributed, global_ray_mesh, assemble_frame)
from quadray_tpu.parallel.mesh import RAY_AXIS  # noqa: E402

import quadray_tpu.parallel.distributed as dist  # noqa: E402

dist._initialized = True   # raw initialize above did the bring-up
assert init_distributed(), "distributed init did not engage"
assert jax.process_count() == 2, jax.process_count()
mesh = global_ray_mesh()
assert mesh.devices.size == 4, mesh

# global psum across both processes' devices (the gradient all-reduce
# communication pattern, here over DCN-simulated links)
sh = NamedSharding(mesh, P(RAY_AXIS))
ga = jax.make_array_from_callback(
    (8,), sh, lambda idx: np.arange(8, dtype=np.float32)[idx])


@jax.jit
@partial(shard_map, mesh=mesh, in_specs=P(RAY_AXIS), out_specs=P())
def total(x):
    return jax.lax.psum(jnp.sum(x), RAY_AXIS)


val = float(np.asarray(jax.device_get(total(ga))))
assert val == 28.0, val

# host frame assembly across processes
piece = jnp.full((2, 3), float(pid), jnp.float32)
asm = assemble_frame(piece)
assert asm.shape == (4, 3), asm.shape
assert float(asm.sum()) == 6.0, asm   # pid-0 zeros + pid-1 ones (2x3)

print(f"OK process {pid}: psum={val} assembled={asm.shape}")

"""Worker for the N-process distributed test (test_distributed.py): joins
an N-process JAX runtime over gloo CPU collectives, builds the
host-aligned mesh, assembles a global array from process-local slices, and
psums it. Run: python distributed_worker.py <process_id> <port> [nprocs]"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from amid_tpu.parallel.distributed import (  # noqa: E402
    host_local_slice,
    initialize_distributed,
    make_host_aligned_mesh,
)


def main() -> None:
    pid, port = int(sys.argv[1]), sys.argv[2]
    nprocs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    initialize_distributed(
        coordinator_address=f"127.0.0.1:{port}", num_processes=nprocs,
        process_id=pid,
    )
    assert jax.process_count() == nprocs, jax.process_count()

    mesh = make_host_aligned_mesh(model_axis=1)
    assert mesh.shape["data"] == nprocs * jax.local_device_count()

    gb = 8
    start, end = host_local_slice(gb)
    local = np.arange(start, end, dtype=np.float32)
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local, (gb,)
    )
    total = float(
        jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
    )
    assert total == float(sum(range(gb))), total
    print(f"DIST_OK p{pid} sum={total}", flush=True)


if __name__ == "__main__":
    main()

"""Worker process for tests/test_multihost.py (not a pytest module).

Invoked as: python multihost_worker.py <port> <process_id> <result_json>

Brings up jax.distributed against a localhost coordinator (2 processes x
4 virtual CPU devices = one 8-device global mesh), then:

1. runs a genuine cross-process collective (sharded global-array sum) and
   checks it against the host value;
2. proves a 128-step program with the REAL sharded pipeline
   (``Prover(mesh=global_mesh)``, protocol v2) — witness build, Merkle
   forest, zerocheck folds, and Lasso reductions all shard over the
   global mesh, so their psums ride the Gloo DCN backend between the two
   processes;
3. writes {"sha256", "num_devices", "num_processes", "collective_ok"} to
   the result file.

ZIGZ_MH_FAULT=sigkill makes process 1 die (SIGKILL, no cleanup) right
after initialization — the fault the supervisor test injects.
"""

import hashlib
import json
import os
import signal
import sys


def main() -> None:
    port, pid, result_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]

    import jax

    # The axon TPU plugin force-prepends itself to jax_platforms; the
    # config update is the only reliable CPU pin (tests/conftest.py).
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        f"127.0.0.1:{port}", num_processes=2, process_id=pid
    )

    if os.environ.get("ZIGZ_MH_FAULT") == "sigkill" and pid == 1:
        os.kill(os.getpid(), signal.SIGKILL)  # simulated host loss

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from zigz_tpu.core.field import BabyBear
    from zigz_tpu.parallel.multihost import global_trace_mesh, sync_hosts
    from zigz_tpu.prover.prover import Prover
    from zigz_tpu.prover.serialization import BinarySerializer

    assert jax.process_count() == 2
    mesh = global_trace_mesh()
    assert mesh.devices.size == 8

    # 1. Cross-process collective: shard a global array over the mesh,
    # reduce to a replicated scalar (XLA inserts the DCN all-reduce).
    full = np.arange(1 << 12, dtype=np.int64)
    arr = jax.make_array_from_callback(
        full.shape, NamedSharding(mesh, P("trace")), lambda idx: full[idx]
    )
    total = int(
        jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
        .addressable_data(0)
    )
    collective_ok = total == int(full.sum())

    sync_hosts("zigz-mh-test")

    # 2. Real sharded prove over the global mesh.
    program = bytes([0x13, 0x00, 0x00, 0x00] * 128)
    proof = Prover(BabyBear, seed=0, protocol_version=2, mesh=mesh).prove(
        program, 0x1000, None, 1 << 9, None, None
    )
    data = BinarySerializer(BabyBear).serialize(proof)

    with open(result_path, "w") as f:
        json.dump(
            {
                "process_id": pid,
                "num_devices": int(mesh.devices.size),
                "num_processes": jax.process_count(),
                "collective_ok": collective_ok,
                "sha256": hashlib.sha256(data).hexdigest(),
            },
            f,
        )


if __name__ == "__main__":
    main()

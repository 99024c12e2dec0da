"""Worker process for the 2-process DCN rehearsal.

Launched by ``test_distributed_dcn.py`` as ``python dcn_worker.py
<process_id> <num_processes> <port>``.  Each process owns 2 XLA host (CPU)
devices; ``jax.distributed.initialize`` connects them through a real gRPC
coordinator on localhost -- the one multi-controller code path the
single-process 8-device virtual mesh cannot exercise
(``parallel.mesh.initialize_distributed``, SURVEY.md section 2.3's DCN row).

The workload mirrors the production bring-up: build the global
``('host', 'chain')`` mesh, shard a chain batch over BOTH axes, and run
window adaptation whose pooled acceptance statistic forces a cross-process
reduction.  Prints ``DCN_OK <step_size> <global_sum>`` on success; the
parent asserts both processes print identical values.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    proc_id, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    import jax

    jax.config.update("jax_platforms", "cpu")

    from binf_tpu.parallel.mesh import initialize_distributed, make_chain_mesh

    n = initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs,
        process_id=proc_id,
    )
    assert n == nprocs, (n, nprocs)
    assert jax.process_count() == nprocs
    assert len(jax.devices()) == 2 * nprocs  # global view
    assert len(jax.local_devices()) == 2

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from binf_tpu.samplers.adaptation import window_adaptation
    from binf_tpu.samplers.hmc import hmc

    mesh = make_chain_mesh(host_axis=True)
    assert mesh.devices.shape == (nprocs, 2)

    def logp(pos):
        return -0.5 * jnp.sum(pos["x"] ** 2)

    def builder(step_size, inverse_mass):
        return hmc(logp, step_size, num_integration_steps=4,
                   inverse_mass=inverse_mass)

    n_chains = 8
    sharding = NamedSharding(mesh, P(("host", "chain"), None))

    # every process materializes its local shard of the global chain batch
    def make_shard(index):
        full = np.arange(n_chains, dtype=np.float32)[:, None] * np.ones(
            (n_chains, 2), np.float32
        ) * 0.1
        return full[index]

    positions = {
        "x": jax.make_array_from_callback((n_chains, 2), sharding, make_shard)
    }

    @jax.jit
    def run(positions, k):
        states = jax.vmap(builder(0.1, None).init)(positions)
        adapt = window_adaptation(
            builder, states, k, num_steps=60, initial_step_size=0.1
        )
        # global reduction over the sharded chain axis -> DCN all-reduce
        total = jnp.sum(adapt.final_states.position["x"])
        return adapt.step_size, total

    step_size, total = run(positions, jax.random.key(0))
    print(f"DCN_OK {float(step_size):.6f} {float(total):.4f}", flush=True)


if __name__ == "__main__":
    main()

"""2-process jax.distributed test for `parallel.mesh.initialize_multihost`.

The driver validates single-process multi-device sharding via
`dryrun_multichip`; this covers the multi-HOST init path (DCN analog) by
spawning two CPU processes that form one jax.distributed cluster, build a
global 2-device mesh, and allreduce across processes. Exercises the exact
entry point a TPU pod slice would use (SURVEY.md §2.6).
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

pytestmark = pytest.mark.slow

_WORKER = textwrap.dedent(
    """
    import sys
    import jax

    # CPU multi-process clusters need the gloo collectives backend for the
    # processes' devices to aggregate into one global topology
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cindm_tpu.parallel.mesh import initialize_multihost, make_mesh

    coord, pid = sys.argv[1], int(sys.argv[2])
    initialize_multihost(coordinator_address=coord, num_processes=2, process_id=pid)
    assert jax.device_count() == 2, jax.device_count()
    assert jax.process_count() == 2

    mesh = make_mesh(2, ("data",))
    # global array: each process contributes its local shard
    local = jnp.full((1, 4), float(pid + 1))
    garr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local, global_shape=(2, 4)
    )
    # jnp.sum over the data-sharded axis with a replicated output forces XLA
    # to insert the cross-process all-reduce
    total = jax.jit(
        jnp.sum, out_shardings=NamedSharding(mesh, P())
    )(garr)
    # sum over the global [2, 4] array = 4*1 + 4*2 = 12
    assert float(total) == 12.0, float(total)
    print(f"proc {pid} OK", flush=True)
    """
)


@pytest.mark.slow
def test_two_process_distributed_init(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # PYTHONPATH deliberately excludes any sitecustomize dir (e.g. the axon
    # TPU plugin's) — those import jax at interpreter startup, initializing
    # the backend before the worker can configure gloo collectives.
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=repo_root)
    # --xla_force_host_platform_device_count also breaks cross-process device
    # aggregation (each process then builds its own local-only topology)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid} OK" in out

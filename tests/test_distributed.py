"""Multi-host runtime tests: bootstrap no-op path + a REAL 2-process run.

The reference has no distributed backend (SURVEY.md §5.8); this covers ours:
``jax.distributed.initialize`` bootstrap, global mesh spanning processes,
host-local -> global data feeding, and a cross-process collective — executed
with two actual OS processes over the gloo CPU collective backend (no
hardware needed), the same code path a TPU pod launch takes.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

from quattro_tpu.parallel import distributed


def test_single_process_is_clean_noop(monkeypatch):
    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID",
                "TPU_WORKER_HOSTNAMES", "TPU_SKIP_MDS_QUERY", "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(var, raising=False)
    assert distributed.initialize() is False
    assert not distributed.is_initialized()
    assert distributed.process_info() == (0, 1)
    distributed.barrier()  # must not hang or require a runtime


_WORKER = textwrap.dedent(
    """
    import sys
    port, pid = sys.argv[1], int(sys.argv[2])
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {repo!r})
    import numpy as np
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from quattro_tpu.parallel import distributed

    ok = distributed.initialize(f"127.0.0.1:{{port}}", num_processes=2, process_id=pid)
    assert ok and distributed.is_initialized()
    assert distributed.process_info() == (pid, 2)
    assert len(jax.devices()) == 2, jax.devices()

    mesh = distributed.global_mesh((2,), ("traj",))

    # Host-local -> global: each process contributes ITS shard.
    local = np.full((2, 4), float(pid + 1))
    garr = distributed.host_local_to_global(mesh, P("traj"), local)
    assert garr.shape == (4, 4)

    # Cross-process collective: psum over the traj axis (gloo on CPU).
    total = shard_map(
        lambda x: jax.lax.psum(jnp.sum(x), "traj"),
        mesh=mesh, in_specs=P("traj"), out_specs=P(),
    )(garr)
    back = distributed.global_to_host_local(mesh, P(), total)
    distributed.barrier()
    print("RESULT", float(back), flush=True)
    """
).format(repo="/root/repo")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_collective(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # one CPU device per process
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(port), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=240)
            outs.append((p.returncode, out, err))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out")

    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{out}\n{err}"
        # sum(global) = 8*1 + 8*2 = 24, replicated to both processes.
        assert "RESULT 24.0" in out, f"unexpected output:\n{out}\n{err}"

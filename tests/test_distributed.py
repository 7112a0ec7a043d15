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


_RICCATI_WORKER = textwrap.dedent(
    """
    import sys
    port, pid = sys.argv[1], int(sys.argv[2])
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    sys.path.insert(0, {repo!r})
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from quattro_tpu.parallel import distributed
    from quattro_tpu.parallel.horizon import sharded_riccati_backward
    from quattro_tpu.solver.derivatives import CostExpansion
    from quattro_tpu.solver.riccati import riccati_backward

    distributed.initialize(f"127.0.0.1:{{port}}", num_processes=2, process_id=pid)
    mesh = distributed.global_mesh((2,), ("horizon",))

    # Both processes generate the SAME problem (fixed seed), so each can
    # compute the full single-device reference locally.
    h, n, m = 32, 4, 2
    rng = np.random.default_rng(7)
    a = jnp.asarray(np.eye(n) * 0.9 + 0.05 * rng.standard_normal((h, n, n)))
    b = jnp.asarray(0.1 * rng.standard_normal((h, n, m)))
    exp = CostExpansion(
        l_x=jnp.asarray(0.1 * rng.standard_normal((h, n))),
        l_u=jnp.asarray(0.1 * rng.standard_normal((h, m))),
        l_xx=jnp.broadcast_to(jnp.eye(n), (h, n, n)),
        l_uu=jnp.broadcast_to(jnp.eye(m), (h, m, m)),
        l_ux=jnp.zeros((h, m, n)),
    )
    v_x = jnp.asarray(rng.standard_normal(n))
    v_xx = jnp.eye(n) * 2.0
    ref = riccati_backward(a, b, exp, v_x, v_xx)

    # Feed the GLOBAL arrays from host-local halves — the pod ingest path.
    half = h // 2
    sl = slice(pid * half, (pid + 1) * half)
    g = lambda x: distributed.host_local_to_global(
        mesh, P("horizon"), np.asarray(x[sl])
    )
    gexp = CostExpansion(*(g(f) for f in exp))
    res = sharded_riccati_backward(mesh, g(a), g(b), gexp, v_x, v_xx)

    # Each process checks ITS horizon shard of the gains.
    k_local = distributed.global_to_host_local(mesh, P("horizon"), res.k_seq)
    bk_local = distributed.global_to_host_local(mesh, P("horizon"), res.big_k_seq)
    np.testing.assert_allclose(k_local, np.asarray(ref.k_seq[sl]), atol=1e-6)
    np.testing.assert_allclose(bk_local, np.asarray(ref.big_k_seq[sl]), atol=1e-6)
    distributed.barrier()
    print("RICCATI-SHARD-OK", flush=True)
    """
).format(repo="/root/repo")


def test_two_process_sharded_riccati(tmp_path):
    """The horizon-partitioned Riccati backward pass (the north-star pod
    config's algorithm) runs across TWO OS PROCESSES — global mesh, host-local
    shard ingest, ppermute halo exchange over gloo — and matches the
    single-device recursion shard-for-shard."""
    script = tmp_path / "riccati_worker.py"
    script.write_text(_RICCATI_WORKER)
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
            out, err = p.communicate(timeout=360)
            outs.append((p.returncode, out, err))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed riccati workers timed out")

    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{out}\n{err}"
        assert "RICCATI-SHARD-OK" in out, f"unexpected output:\n{out}\n{err}"

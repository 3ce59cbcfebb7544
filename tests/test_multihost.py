"""True multi-process multihost test: 2 processes x 4 spoofed CPU devices.

Goes beyond the reference's testing story — its 2-process ddp_sim test is
marked xfail ("DDP currently failing", /root/reference/runner/tests/
test_train.py:52-62). Here two OS processes form a real jax.distributed
cluster (the production multihost code path in cfm_tpu.parallel.mesh:
initialize_distributed -> make_mesh -> shard_batch_per_host), run one
data-parallel OT-CFM train step on per-host disjoint data, and must agree
bitwise on the replicated loss.
"""

import socket
import subprocess
import sys
import textwrap

import pytest

_CHILD = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")

    from cfm_tpu.parallel.mesh import (
        initialize_distributed, make_mesh, replicated_sharding,
        shard_batch_per_host,
    )

    port, pid = sys.argv[1], int(sys.argv[2])
    initialize_distributed(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid,
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()

    import jax.numpy as jnp
    import numpy as np
    from cfm_tpu import ExactOptimalTransportConditionalFlowMatcher
    from cfm_tpu.models import MLP
    from cfm_tpu.train import (
        init_train_state, make_data_parallel_train_step, make_optimizer,
    )

    mesh = make_mesh(("data",))
    model = MLP(dim=2, w=32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2,)), jnp.zeros((2, 2)))
    opt = make_optimizer(lr=1e-3, warmup_steps=0)
    state = init_train_state(params, opt)
    state = jax.device_put(state, replicated_sharding(mesh))
    step = make_data_parallel_train_step(
        ExactOptimalTransportConditionalFlowMatcher(sigma=0.0),
        model.apply, opt, mesh)

    # Per-host DISJOINT data (the DistributedSampler role): host p sees rows
    # seeded by p. Global batch 32 = 16 local x 2 hosts.
    rng = np.random.default_rng(100 + pid)
    x0 = shard_batch_per_host(mesh, rng.normal(size=(16, 2)).astype(np.float32))
    x1 = shard_batch_per_host(mesh, (rng.normal(size=(16, 2)) + 3).astype(np.float32))
    state, metrics = step(state, jax.random.PRNGKey(7), x0, x1)
    loss = float(metrics["loss"])
    assert np.isfinite(loss)
    print(f"MULTIHOST_LOSS {pid} {loss:.9f}", flush=True)
""")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_multihost_train_step(tmp_path):
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _CHILD, str(port), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd="/root/repo",
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
        assert p.returncode == 0, out[-2000:]
    losses = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("MULTIHOST_LOSS"):
                _, pid, loss = line.split()
                losses[int(pid)] = float(loss)
    assert set(losses) == {0, 1}, outs
    # The loss is psum-reduced and replicated: both hosts see the same value.
    assert losses[0] == losses[1], losses


# ---------------------------------------------------------------------------
# DCN-shaped 2-level mesh: 2 processes x 4 devices, axes ("dcn", "data").
# Proves the axis-ordering claim in parallel/mesh.py:12-14 (slowest-varying
# "dcn" axis maps across processes, in-slice "data" axis stays local) for
# BOTH sharding modes, and that the multihost result equals the
# single-process 8-device run on the same global batch.
# ---------------------------------------------------------------------------

_CHILD_DCN = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")

    from cfm_tpu.parallel.mesh import (
        initialize_distributed, local_coupling_step, make_mesh,
        replicated_sharding, shard_batch_per_host,
    )

    port, pid = sys.argv[1], int(sys.argv[2])
    initialize_distributed(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid,
    )
    assert jax.process_count() == 2
    assert jax.device_count() == 8

    import jax.numpy as jnp
    import numpy as np
    from cfm_tpu import ExactOptimalTransportConditionalFlowMatcher
    from cfm_tpu.models import MLP
    from cfm_tpu.train import (
        init_train_state, make_data_parallel_train_step, make_optimizer,
        make_train_step,
    )

    AX = ("dcn", "data")
    mesh = make_mesh(AX, axis_sizes=(2, 4))
    # dcn varies slowest: this process's 4 local devices must form one dcn row.
    local_ids = {d.id for d in jax.local_devices()}
    row = mesh.devices[pid]
    assert {d.id for d in row} == local_ids, (pid, mesh.devices)

    model = MLP(dim=2, w=32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2,)), jnp.zeros((2, 2)))
    opt = make_optimizer(lr=1e-3, warmup_steps=0)
    matcher = ExactOptimalTransportConditionalFlowMatcher(sigma=0.0)

    rng = np.random.default_rng(100 + pid)
    x0_local = rng.normal(size=(16, 2)).astype(np.float32)
    x1_local = (rng.normal(size=(16, 2)) + 3).astype(np.float32)

    # Mode 1: dp-jit with replicated global coupling over the 2-level mesh.
    state = jax.device_put(init_train_state(params, opt),
                           replicated_sharding(mesh))
    step = make_data_parallel_train_step(matcher, model.apply, opt, mesh,
                                         data_axis=AX)
    x0 = shard_batch_per_host(mesh, x0_local, axis=AX)
    x1 = shard_batch_per_host(mesh, x1_local, axis=AX)
    _, metrics = step(state, jax.random.PRNGKey(7), x0, x1)
    print(f"DCN_DP_LOSS {pid} {float(metrics['loss']):.9f}", flush=True)

    # Mode 2: shard_map local coupling (per-device plans, DDP semantics).
    # Fresh params: mode 1 donated its state, which may alias `params`
    # (device_put no-copies when the sharding already matches).
    params2 = model.init(jax.random.PRNGKey(0), jnp.zeros((2,)), jnp.zeros((2, 2)))
    state2 = jax.device_put(init_train_state(params2, opt),
                            replicated_sharding(mesh))
    inner = make_train_step(matcher, model.apply, opt, data_axis=AX)
    local_step = jax.jit(local_coupling_step(inner, mesh, axis=AX))
    _, m2 = local_step(state2, jax.random.PRNGKey(7), x0, x1)
    print(f"DCN_LOCAL_LOSS {pid} {float(m2['loss']):.9f}", flush=True)
""")

_SINGLE_DCN = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    import jax
    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from cfm_tpu import ExactOptimalTransportConditionalFlowMatcher
    from cfm_tpu.models import MLP
    from cfm_tpu.parallel.mesh import (
        local_coupling_step, make_mesh, replicated_sharding,
        shard_batch_per_host,
    )
    from cfm_tpu.train import (
        init_train_state, make_data_parallel_train_step, make_optimizer,
        make_train_step,
    )

    AX = ("dcn", "data")
    mesh = make_mesh(AX, axis_sizes=(2, 4))
    model = MLP(dim=2, w=32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2,)), jnp.zeros((2, 2)))
    opt = make_optimizer(lr=1e-3, warmup_steps=0)
    matcher = ExactOptimalTransportConditionalFlowMatcher(sigma=0.0)

    # Identical GLOBAL batch: host-0 rows then host-1 rows.
    r0, r1 = np.random.default_rng(100), np.random.default_rng(101)
    a0, a1 = r0.normal(size=(16, 2)), r1.normal(size=(16, 2))
    b0, b1 = r0.normal(size=(16, 2)) + 3, r1.normal(size=(16, 2)) + 3
    x0 = shard_batch_per_host(
        mesh, np.concatenate([a0, a1]).astype(np.float32), axis=AX)
    x1 = shard_batch_per_host(
        mesh, np.concatenate([b0, b1]).astype(np.float32), axis=AX)

    state = jax.device_put(init_train_state(params, opt),
                           replicated_sharding(mesh))
    step = make_data_parallel_train_step(matcher, model.apply, opt, mesh,
                                         data_axis=AX)
    _, metrics = step(state, jax.random.PRNGKey(7), x0, x1)
    print(f"DCN_DP_LOSS single {float(metrics['loss']):.9f}", flush=True)

    params2 = model.init(jax.random.PRNGKey(0), jnp.zeros((2,)), jnp.zeros((2, 2)))
    state2 = jax.device_put(init_train_state(params2, opt),
                            replicated_sharding(mesh))
    inner = make_train_step(matcher, model.apply, opt, data_axis=AX)
    local_step = jax.jit(local_coupling_step(inner, mesh, axis=AX))
    _, m2 = local_step(state2, jax.random.PRNGKey(7), x0, x1)
    print(f"DCN_LOCAL_LOSS single {float(m2['loss']):.9f}", flush=True)
""")


@pytest.mark.slow
def test_dcn_two_level_mesh_matches_single_process(tmp_path):
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _CHILD_DCN, str(port), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd="/root/repo",
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
        assert p.returncode == 0, out[-3000:]

    single = subprocess.run(
        [sys.executable, "-c", _SINGLE_DCN], capture_output=True, text=True,
        cwd="/root/repo", timeout=300,
    )
    assert single.returncode == 0, single.stdout[-1500:] + single.stderr[-1500:]

    def collect(text, tag):
        vals = {}
        for line in text.splitlines():
            if line.startswith(tag):
                _, who, loss = line.split()
                vals[who] = float(loss)
        return vals

    for tag in ("DCN_DP_LOSS", "DCN_LOCAL_LOSS"):
        multi = {}
        for out in outs:
            multi.update(collect(out, tag))
        assert set(multi) == {"0", "1"}, outs
        # psum-replicated: both hosts agree bitwise.
        assert multi["0"] == multi["1"], (tag, multi)
        ref = collect(single.stdout, tag)["single"]
        # Same global batch + same mesh topology: the multihost SPMD program
        # computes the single-process value.
        assert abs(multi["0"] - ref) < 1e-6, (tag, multi["0"], ref)

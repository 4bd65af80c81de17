"""Two-process CPU cluster: jax.distributed init + global data mesh +
cross-process collective and batch assembly (VERDICT item 7)."""
import os
import subprocess

import pytest
import sys
import textwrap
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

WORKER = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, os.environ["REPO_ROOT"])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp
    from focalformer3d_tpu.parallel import mesh as M

    ok = M.init_distributed()
    assert ok, "init_distributed returned False"
    assert jax.process_count() == 2
    mesh = M.make_global_mesh()
    assert mesh.devices.size == 4  # 2 procs x 2 virtual devices

    pid = jax.process_index()
    local = np.full((2, 3), float(pid), np.float32)  # per-process shard
    batch = M.shard_global_batch(mesh, {"x": local})
    assert batch["x"].shape == (4, 3)  # global batch assembled

    s = jax.jit(lambda b: jnp.sum(b["x"]))(batch)
    got = M.gather_to_host(s)
    assert float(np.ravel(got)[0]) == 6.0  # 0*6 + 1*6
    if M.is_main_process():
        print("MULTIHOST_OK")
""")


def test_two_process_cpu_cluster(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env_base = {
        **os.environ,
        "REPO_ROOT": str(ROOT),
        "JAX_COORDINATOR_ADDRESS": "127.0.0.1:29511",
        "JAX_NUM_PROCESSES": "2",
    }
    procs = []
    for pid in range(2):
        env = {**env_base, "JAX_PROCESS_ID": str(pid)}
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se[-2000:]
    assert "MULTIHOST_OK" in outs[0][0]


@pytest.mark.slow
def test_flagship_dp_train_step_compiles_on_8dev_mesh():
    """VERDICT r3 item 7: the tiny-topology dryrun executes a full train
    step but at test shapes; this compiles the REAL FocalFormer3D_L DP
    train step (production 1440^2 grid, measured capacities, 300
    proposals) over a virtual 8-device mesh. SPMD partitioning runs at
    compile time, which is where flagship-shape sharding bugs live.
    ~8 min on one CPU (XLA compile time), hence slow-marked; also
    runnable standalone via tools/dryrun_flagship.py."""
    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": (os.environ.get("XLA_FLAGS", "")
                      + " --xla_force_host_platform_device_count=8"),
    }
    proc = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "dryrun_flagship.py"), "8"],
        env=env, capture_output=True, text=True, timeout=1800,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "compiled OK" in proc.stdout

"""Multi-PROCESS execution of the distributed backend on the CPU fake
backend: 2 coordinated jax processes, 4 virtual devices each (8 global).

Executes the branches that single-process tests can never reach:
jax.distributed.initialize, put_global_batch's
make_array_from_process_local_data assembly, host-sharded loaders, and
rank-0 gating. Reference parity point: the NCCL process-group launch of
train_eval_amp.py:121-131,220-222.
"""

import glob
import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch(argv, proc_id, port, n_local, extra_env=None):
    env = dict(os.environ)
    env.update({
        "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": f"--xla_force_host_platform_device_count={n_local}",
        "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
        "JAX_NUM_PROCESSES": "2",
        "JAX_PROCESS_ID": str(proc_id),
        # the children are tiny; keep them off the TPU plugin entirely
        "TFNAS_NATIVE_THREADS": "1",
    })
    env.update(extra_env or {})
    return subprocess.Popen(argv, cwd=REPO, env=env,
                            stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)


def _run_pair(argv0, argv1, timeout, n_local=4):
    port = _free_port()
    p0 = _launch(argv0, 0, port, n_local)
    p1 = _launch(argv1, 1, port, n_local)
    try:
        out0, _ = p0.communicate(timeout=timeout)
        out1, _ = p1.communicate(timeout=timeout)
    finally:
        for p in (p0, p1):
            if p.poll() is None:
                p.kill()
    assert p0.returncode == 0, f"proc0 failed:\n{out0[-4000:]}"
    assert p1.returncode == 0, f"proc1 failed:\n{out1[-4000:]}"
    return out0, out1


def test_put_global_batch_two_processes():
    """Globally-sharded array assembled from two processes' distinct local
    shards; collective sum sees both; exactly one main process."""
    argv = [sys.executable, "tests/_mp_child.py"]
    out0, out1 = _run_pair(argv, argv, timeout=240)
    assert "MP_CHILD_OK proc=0/2" in out0
    assert "MP_CHILD_OK proc=1/2" in out1


@pytest.mark.slow  # two full driver subprocesses thrash the 1-core box
def test_train_eval_two_processes(tmp_path):
    """train_eval.py --synthetic under a real 2-process launch: global batch
    8 = 2 hosts x 4 local; rank-0-only checkpointing.

    Slow-marked: the pair of JAX subprocesses alone has a 600 s ceiling on
    this single-core host and pushed the fast suite from ~12 to ~19 min.
    The cheap _mp_child smoke above keeps multi-process coverage in the
    fast suite; this full-driver variant runs with `-m slow`."""
    cfg = str(tmp_path / "model.config")
    save = str(tmp_path / "eval")
    # tiny deployable config via the tiny fixture space (no search needed)
    mk = subprocess.run(
        [sys.executable, "-c", f"""
import json
import jax
from tfnas_tpu.utils.platform import honor_cpu_platform_request
honor_cpu_platform_request()
from tfnas_tpu.models import search_space as ss
from tfnas_tpu.models.eval_net import EvalNetwork
from tfnas_tpu.search.parser import get_mc_num_dddict, parse_architecture
import numpy as np
sp = ss.tiny_space(32)
op_w = [np.eye(8)[0]] * sp.TOTAL_BLOCKS
depth_w = [np.eye(sp.STAGE_DEPTHS[s])[0] for s in sp.STAGE_NAMES]
arch = parse_architecture(op_w, depth_w, space=sp)
mc = get_mc_num_dddict(sp.build_mc_mask_dddict())
net = EvalNetwork.from_parsed_arch(10, arch, mc, space=sp)
json.dump(net.config, open({cfg!r}, 'w'))
"""],
        cwd=REPO, env={**os.environ, "JAX_PLATFORMS": "cpu"},
        capture_output=True, text=True)
    assert mk.returncode == 0, mk.stdout + mk.stderr

    argv = [sys.executable, "train_eval.py", "--synthetic",
            "--config_path", cfg, "--epochs", "1", "--steps_per_epoch", "2",
            "--image_size", "32", "--batch_size", "8", "--num_classes", "10",
            "--save", save, "--print_freq", "1", "--note", "mp",
            "--workers", "1"]
    out0, out1 = _run_pair(argv, argv, timeout=600)
    assert "process 0/2" in out0 and "4 local / 8 global devices" in out0
    assert "process 1/2" in out1
    assert "global train batch x: (8, 32, 32, 3)" in out0  # assembled shape
    # rank-0-only writes: exactly the main process made the run dir
    ckpts = glob.glob(save + "/eval-*/checkpoint.pkl")
    assert len(ckpts) == 1, ckpts
    assert "Val_acc_top1" in out0 and "Val_acc_top1" in out1

"""Real multi-process execution of the distributed surface: two OS processes
rendezvous through ``jax.distributed`` (the TPU-native replacement for the
reference's NCCL env-var rendezvous, src/main.py:6-7,72-73), form one global
4-device mesh (2 virtual CPU devices per process), shard the per-host loader
by ``process_info()``, and run one global-collective train step. The loss
must match a plain single-process step on the identical global batch.

This executes ``initialize_multihost`` for real — the one distributed code
path the fake-8-device tests cannot reach.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

WORKER = r"""
import json, sys
pid, port, outdir, repo = int(sys.argv[1]), sys.argv[2], sys.argv[3], sys.argv[4]
sys.path.insert(0, repo)

import numpy as np
import jax

from diffusiondepth_tpu.parallel.mesh import (
    batch_sharding, create_mesh, initialize_multihost, process_info,
)

initialize_multihost(f"localhost:{port}", num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()
assert jax.local_device_count() == 2, jax.local_device_count()
info = process_info()
assert info == {"host_index": pid, "host_count": 2}, info

# ---- per-host loader sharding driven by process_info (the
# DistributedSampler equivalent, reference src/main.py:83-87)
from diffusiondepth_tpu.config import Config
from diffusiondepth_tpu.data import DataLoader, get as get_data

cfg = Config(
    data_name="Synthetic", patch_height=32, patch_width=48,
    model_name="Diffusion_DCbase_", backbone_name="mmbev_res18",
    head_specify="DDIMDepthEstimate_Res", inference_steps=2,
    batch_size=8, max_depth=10.0,
).finalize()
ds = get_data(cfg)(cfg, "train")  # 64 samples
loader = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True, seed=1,
                    host_index=info["host_index"],
                    host_count=info["host_count"])
loader.set_epoch(0)
n_batches = len(loader)
first = next(iter(loader))
loader_fp = float(np.asarray(first["rgb"], np.float64).sum())

# ---- one global-collective train step over the 2-process mesh
from diffusiondepth_tpu.losses import LossComputer
from diffusiondepth_tpu.models import build_model
from diffusiondepth_tpu.training import (
    create_train_state, make_optimizer, make_train_step,
)

model = build_model(cfg)
lc = LossComputer(cfg)
rng = np.random.RandomState(0)
gt = np.clip(rng.rand(8, 32, 48, 1) * 8 + 1, 0, 10).astype(np.float32)
batch_global = {
    "rgb": rng.randn(8, 32, 48, 3).astype(np.float32),
    "dep": gt, "gt": gt, "depth_map": gt,
    "depth_mask": np.ones((8, 32, 48, 1), np.float32),
}
tx = make_optimizer(cfg, steps_per_epoch=10)
state = create_train_state(
    model, tx, {k: v[:1] for k, v in batch_global.items()},
    jax.random.PRNGKey(0),
)

mesh = create_mesh()  # all 4 global devices on the 'data' axis
sh = batch_sharding(mesh)
lo, hi = pid * 4, (pid + 1) * 4  # this host's shard of the global batch
gbatch = {
    k: jax.make_array_from_process_local_data(sh, v[lo:hi])
    for k, v in batch_global.items()
}
step = make_train_step(model, lc, mesh=mesh, donate=False)
new_state, loss, loss_val, metric_val = step(state, gbatch, jax.random.PRNGKey(1))
param_fp = float(
    jax.tree_util.tree_reduce(
        lambda a, x: a + float(np.abs(np.asarray(x, np.float64)).sum()),
        new_state.params, 0.0,
    )
)
with open(f"{outdir}/result_{pid}.json", "w") as f:
    json.dump({
        "loss": float(loss),
        "loss_val": np.asarray(loss_val, np.float64).tolist(),
        "param_fp": param_fp,
        "n_batches": n_batches,
        "loader_fp": loader_fp,
    }, f)
print("WORKER_OK", pid, flush=True)
"""


@pytest.mark.slow
def test_two_process_jax_distributed_train_step(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER)

    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS", "XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), str(port), str(tmp_path),
             str(REPO)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=1200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"WORKER_OK {pid}" in out

    r0 = json.loads((tmp_path / "result_0.json").read_text())
    r1 = json.loads((tmp_path / "result_1.json").read_text())

    # the two processes agree on the globally-reduced results
    np.testing.assert_allclose(r0["loss"], r1["loss"], rtol=1e-6)
    np.testing.assert_allclose(r0["param_fp"], r1["param_fp"], rtol=1e-6)
    # per-host loader sharding: same per-host batch count, different shards
    assert r0["n_batches"] == r1["n_batches"] == 8  # 64 samples / 2 hosts / 4
    assert r0["loader_fp"] != r1["loader_fp"]

    # and the distributed loss equals a plain single-process step on the
    # identical global batch (DDP == big-batch semantics)
    import jax

    from diffusiondepth_tpu.config import Config
    from diffusiondepth_tpu.losses import LossComputer
    from diffusiondepth_tpu.models import build_model
    from diffusiondepth_tpu.training import (
        create_train_state, make_optimizer, make_train_step,
    )

    cfg = Config(
        model_name="Diffusion_DCbase_", backbone_name="mmbev_res18",
        head_specify="DDIMDepthEstimate_Res", inference_steps=2,
        batch_size=8, max_depth=10.0,
    ).finalize()
    model = build_model(cfg)
    lc = LossComputer(cfg)
    rng = np.random.RandomState(0)
    gt = np.clip(rng.rand(8, 32, 48, 1) * 8 + 1, 0, 10).astype(np.float32)
    batch = {
        "rgb": rng.randn(8, 32, 48, 3).astype(np.float32),
        "dep": gt, "gt": gt, "depth_map": gt,
        "depth_mask": np.ones((8, 32, 48, 1), np.float32),
    }
    tx = make_optimizer(cfg, steps_per_epoch=10)
    state = create_train_state(
        model, tx, {k: v[:1] for k, v in batch.items()}, jax.random.PRNGKey(0)
    )
    step = make_train_step(model, lc, mesh=None, donate=False)
    _, loss, _, _ = step(state, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(r0["loss"], float(loss), rtol=2e-4)


COMBINED_WORKER = r"""
import json, sys
pid, port, outdir, repo = int(sys.argv[1]), sys.argv[2], sys.argv[3], sys.argv[4]
sys.path.insert(0, repo)

import numpy as np
import jax

from diffusiondepth_tpu.parallel.mesh import (
    batch_sharding, create_mesh, initialize_multihost, state_sharding,
)

initialize_multihost(f"localhost:{port}", num_processes=2, process_id=pid)
assert jax.device_count() == 4, jax.device_count()

# ---- the realistic pod topology in one program: 2 hosts x 2 local devices,
# 2-D (data x model) mesh, gradient accumulation, flagship-family
# architecture (Swin backbone + HAHI neck + ADDHAHI head + scan sampler)
from diffusiondepth_tpu.config import Config
from diffusiondepth_tpu.losses import LossComputer
from diffusiondepth_tpu.models.diffusion_model import Diffusion_DCbase_Model
from diffusiondepth_tpu.training import (
    create_train_state, make_optimizer, make_train_step,
)

cfg = Config(
    model_name="Diffusion_DCbase_", backbone_module="swin",
    backbone_name="swin_micro",
    head_specify="DDIMDepthEstimate_Swin_ADDHAHI", inference_steps=2,
    batch_size=8, accum_steps=2, max_depth=10.0,
).finalize()
model = Diffusion_DCbase_Model(
    backbone_name=cfg.backbone_name, backbone_module=cfg.backbone_module,
    head_name=cfg.head_specify, inference_steps=cfg.inference_steps,
    head_in_channels=(32, 64, 128, 256),  # swin_micro pyramid
)
lc = LossComputer(cfg)
rng = np.random.RandomState(0)
gt = np.clip(rng.rand(8, 32, 48, 1) * 8 + 1, 0, 10).astype(np.float32)
batch_global = {
    "rgb": rng.randn(8, 32, 48, 3).astype(np.float32),
    "dep": gt, "gt": gt, "depth_map": gt,
    "depth_mask": np.ones((8, 32, 48, 1), np.float32),
}
tx = make_optimizer(cfg, steps_per_epoch=10)
state = create_train_state(
    model, tx, {k: v[:1] for k, v in batch_global.items()},
    jax.random.PRNGKey(0),
)

mesh = create_mesh("data:2,model:2")
shardings = state_sharding(state, mesh, min_size=2**12)
state = jax.device_put(state, shardings)
sh = batch_sharding(mesh)
# data axis size 2 over 4 devices: each host's 2 local devices hold rows of
# the global batch per the mesh layout; feed this host's local rows
local = {
    k: jax.make_array_from_process_local_data(sh, v[pid * 4:(pid + 1) * 4])
    for k, v in batch_global.items()
}
step = make_train_step(model, lc, mesh=mesh, donate=False,
                       state_shardings=shardings, accum_steps=2)
new_state, loss, loss_val, metric_val = step(state, local, jax.random.PRNGKey(1))
param_fp = float(
    jax.tree_util.tree_reduce(
        lambda a, x: a + float(np.abs(np.asarray(x, np.float64)).sum()),
        new_state.params, 0.0,
    )
)
with open(f"{outdir}/combined_{pid}.json", "w") as f:
    json.dump({"loss": float(loss), "param_fp": param_fp}, f)
print("COMBINED_OK", pid, flush=True)
"""


@pytest.mark.slow
def test_two_process_tp_accum_flagship_family(tmp_path):
    """Composition certificate for the realistic pod topology: 2 OS processes
    (hosts) x 2 local devices, a 2-D data:2,model:2 mesh (tensor-parallel
    param sharding via ``state_sharding``), ``accum_steps=2`` gradient
    accumulation, on the flagship-family Swin+HAHI+ADDHAHI architecture.
    The prior proofs each ran one axis alone (plain-DP 2-process, TP
    single-process, accumulation single-process); this runs them together
    and checks the result against a plain single-process accumulated step
    on the identical global batch."""
    port = _free_port()
    script = tmp_path / "combined_worker.py"
    script.write_text(COMBINED_WORKER)

    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS", "XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), str(port), str(tmp_path),
             str(REPO)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=1800)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"COMBINED_OK {pid}" in out

    r0 = json.loads((tmp_path / "combined_0.json").read_text())
    r1 = json.loads((tmp_path / "combined_1.json").read_text())
    np.testing.assert_allclose(r0["loss"], r1["loss"], rtol=1e-6)
    np.testing.assert_allclose(r0["param_fp"], r1["param_fp"], rtol=1e-6)

    # reference check: single-process accumulated step, same global batch
    import jax

    from diffusiondepth_tpu.config import Config
    from diffusiondepth_tpu.losses import LossComputer
    from diffusiondepth_tpu.models.diffusion_model import Diffusion_DCbase_Model
    from diffusiondepth_tpu.training import (
        create_train_state, make_optimizer, make_train_step,
    )

    cfg = Config(
        model_name="Diffusion_DCbase_", backbone_module="swin",
        backbone_name="swin_micro",
        head_specify="DDIMDepthEstimate_Swin_ADDHAHI", inference_steps=2,
        batch_size=8, accum_steps=2, max_depth=10.0,
    ).finalize()
    model = Diffusion_DCbase_Model(
        backbone_name=cfg.backbone_name, backbone_module=cfg.backbone_module,
        head_name=cfg.head_specify, inference_steps=cfg.inference_steps,
        head_in_channels=(32, 64, 128, 256),
    )
    lc = LossComputer(cfg)
    rng = np.random.RandomState(0)
    gt = np.clip(rng.rand(8, 32, 48, 1) * 8 + 1, 0, 10).astype(np.float32)
    batch = {
        "rgb": rng.randn(8, 32, 48, 3).astype(np.float32),
        "dep": gt, "gt": gt, "depth_map": gt,
        "depth_mask": np.ones((8, 32, 48, 1), np.float32),
    }
    tx = make_optimizer(cfg, steps_per_epoch=10)
    state = create_train_state(
        model, tx, {k: v[:1] for k, v in batch.items()}, jax.random.PRNGKey(0)
    )
    step = make_train_step(model, lc, mesh=None, donate=False, accum_steps=2)
    _, loss, _, _ = step(state, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(r0["loss"], float(loss), rtol=2e-4)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port

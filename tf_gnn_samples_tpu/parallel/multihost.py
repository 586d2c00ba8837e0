"""Multi-host (multi-process) training: DCN-spanning meshes.

NEW capability (the reference is single-process, single-device —
SURVEY.md §2.3; its multi-host usage was embarrassingly-parallel sweeps).
This module follows the standard multi-controller JAX recipe:

* `initialize` wires the processes together (jax.distributed) from
  explicit arguments, environment variables, or the platform's automatic
  discovery (TPU pods need no arguments at all).
* After initialization, `jax.devices()` is GLOBAL: `make_hybrid_mesh`
  lays a (dp, gp) mesh over it with the gp axis CONTIGUOUS WITHIN a
  process — gp collectives (the per-layer all_gather / halo exchange of
  parallel/graph_parallel.py) ride ICI links inside each host, while the
  dp axis (one gradient psum per step) crosses hosts over DCN. This is
  the bandwidth-correct orientation: graph parallelism communicates
  L*N*D floats per LAYER, data parallelism one parameter-sized psum per
  STEP.
* Each process feeds only its LOCAL slice of the batch;
  `global_dp_batch` assembles the global stacked batch from per-process
  local stacks (jax.make_array_from_process_local_data).
* `make_multihost_dp_train_step` mirrors data_parallel.make_dp_train_step
  with REPLICATED (psum-reduced) metrics so every host observes identical
  results without cross-process host communication.

Launch (2 hosts):
    # host 0:
    python train.py RGCN PPI --coordinator host0:1234 --num-hosts 2 --host-id 0
    # host 1:
    python train.py RGCN PPI --coordinator host0:1234 --num-hosts 2 --host-id 1

Correctness is validated without real hosts by `run_multihost_check`,
which launches N local processes of virtual CPU devices and asserts the
distributed DP gradient step matches a single-process computation of the
combined-batch update (same bar as tests/test_runtime.py DP exactness).
"""

import os
import socket
import subprocess
import sys
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..runtime.optimizers import clip_grads_per_tensor


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize from args or environment.

    Environment fallbacks: GRAFT_COORDINATOR / GRAFT_NUM_PROCESSES /
    GRAFT_PROCESS_ID. With nothing provided, defers to JAX's automatic
    cluster detection (TPU pods, SLURM, ...)."""
    coordinator_address = coordinator_address or os.environ.get(
        "GRAFT_COORDINATOR")
    if num_processes is None and os.environ.get("GRAFT_NUM_PROCESSES"):
        num_processes = int(os.environ["GRAFT_NUM_PROCESSES"])
    if process_id is None and os.environ.get("GRAFT_PROCESS_ID"):
        process_id = int(os.environ["GRAFT_PROCESS_ID"])
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def make_hybrid_mesh(gp: int = 1, dp: Optional[int] = None,
                     axis_names=("dp", "gp")) -> Mesh:
    """Global (dp, gp) mesh with gp contiguous within a process.

    jax.devices() orders devices by process, so reshaping to [dp, gp]
    keeps each gp group inside one host whenever gp divides the local
    device count — gp collectives stay on ICI, dp crosses DCN."""
    devs = jax.devices()
    total = len(devs)
    local = jax.local_device_count()
    if gp > local or local % gp != 0:
        raise ValueError(
            "gp=%d must divide the local device count %d (gp collectives "
            "must stay within one host)" % (gp, local)
        )
    if dp is None:
        dp = total // gp
    if dp * gp != total:
        raise ValueError("dp*gp=%d != %d global devices" % (dp * gp, total))
    return Mesh(np.array(devs).reshape(dp, gp), axis_names)


def global_dp_batch(stacked_local, mesh: Mesh, axis_name: str = "dp"):
    """Assemble the GLOBAL stacked batch from this process's local stack.

    stacked_local leaves have a leading axis of local_replicas =
    dp_size / process_count; the returned global arrays have leading axis
    dp_size, shard i living on the process that provided it."""
    nproc = jax.process_count()

    def to_global(x):
        x = np.asarray(x)
        sharding = NamedSharding(
            mesh, P(axis_name, *([None] * (x.ndim - 1)))
        )
        return jax.make_array_from_process_local_data(
            sharding, x, (x.shape[0] * nproc,) + x.shape[1:]
        )

    return jax.tree_util.tree_map(to_global, stacked_local)


def make_multihost_dp_train_step(model, mesh: Mesh, axis_name: str = "dp"):
    """Data-parallel train step over a (possibly multi-host) mesh with
    REPLICATED metrics: per-device metric dicts are graph-weighted and
    psum-reduced inside the step, so every process reads identical
    values from its addressable shards (no host-side gathering of
    remote metrics). Loss comes back as the graph-weighted fold
    convention sum(loss_b * num_graphs_b) / num_graphs."""
    clip_norm = model.params["clamp_gradient_norm"]

    def per_device(params, opt_state, rng, batch):
        batch = jax.tree_util.tree_map(lambda x: x[0], batch)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: model._forward(p, batch, rng), has_aux=True
        )(params)
        num_graphs = batch.graph.num_graphs.astype(jnp.float32)
        total_graphs = jax.lax.psum(num_graphs, axis_name)
        weight = num_graphs / total_graphs
        grads = jax.lax.psum(
            jax.tree_util.tree_map(lambda g: g * weight, grads), axis_name
        )
        grads = clip_grads_per_tensor(grads, clip_norm)
        lr = model._effective_lr(total_graphs)
        new_params, new_opt_state = model._optimizer.update(
            grads, opt_state, params, lr
        )
        red = {
            k: jax.lax.psum(v * weight, axis_name)
            for k, v in metrics.items()
        }
        red["total_graphs"] = total_graphs
        return new_params, new_opt_state, red

    sharded = shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P(), P(), P(axis_name)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0, 1))


def make_hybrid_gp_train_step(model, mesh: Mesh, dp_axis: str = "dp",
                              gp_axis: str = "gp"):
    """Hybrid data- x graph-parallel train step over a (dp, gp) mesh.

    Each dp ROW of the mesh trains its OWN packed batch whose mega-graph
    is node-partitioned across the row's gp devices (the task-generic GP
    semantics of parallel/graph_parallel.make_gp_task_steps: replicated
    task input/output models around a sharded propagation). Gradients are
    pmean-reduced over gp (the row shares one batch) and then
    graph-weighted psum-reduced over dp (rows hold different batches) —
    the exact composition `make_hybrid_mesh` orients for hardware: gp
    collectives (per-layer all_gather / halo all_to_all) stay within a
    host on ICI while the one per-step dp psum crosses hosts on DCN.

    Inputs per step: `batch` leaves stacked [dp, ...] (row-replicated over
    gp, spec P(dp)); `shard` leaves stacked [dp * gp, ...] in dp-major
    order (spec P((dp, gp))). Metrics come back replicated (graph-weighted
    dp-psum of the per-row values), so every process reads identical
    results from its addressable shards."""
    from .graph_parallel import gp_propagation_apply

    clip_norm = model.params["clamp_gradient_norm"]
    layer_name = model.layer_name
    layer_kwargs = model.layer_kwargs()

    def forward(params, shard, h0_full, rng, n_pad):
        idx = jax.lax.axis_index(gp_axis)
        n_local = shard.node_features.shape[0]
        n_global = n_local * mesh.shape[gp_axis]
        h0 = jnp.pad(h0_full, ((0, n_global - h0_full.shape[0]), (0, 0)))
        h_local = jax.lax.dynamic_slice_in_dim(h0, idx * n_local, n_local)
        h_local = gp_propagation_apply(
            params["prop"], model.params, shard, h_local, gp_axis,
            layer_name, layer_kwargs, rng=rng,
        )
        h_full = jax.lax.all_gather(h_local, gp_axis, axis=0, tiled=True)
        return h_full[:n_pad]

    def per_device(params, opt_state, rng, batch, shard):
        batch = jax.tree_util.tree_map(lambda x: x[0], batch)
        shard = jax.tree_util.tree_map(lambda x: x[0], shard)
        # RNG: fold by dp row (distinct batches, like the DP step), keep
        # input/output dropout IDENTICAL within a row (replicated heads),
        # fold the propagation key by gp position (sharded dropout).
        row_rng = jax.random.fold_in(rng, jax.lax.axis_index(dp_axis))
        dev_rng = jax.random.fold_in(row_rng, jax.lax.axis_index(gp_axis))
        rng_in, _, rng_out = jax.random.split(row_rng, 3)
        _, _, dev_rng_prop = jax.random.split(dev_rng, 3)

        def loss_fn(p):
            feats = model.task.input_apply(p["input"], batch, rng_in)
            h_full = forward(p, shard, feats, dev_rng_prop,
                             batch.graph.n_pad)
            loss, metrics = model.task.output_apply(
                p["output"], batch, h_full, feats, rng_out
            )
            return loss, metrics

        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        grads = jax.lax.pmean(grads, gp_axis)
        num_graphs = batch.graph.num_graphs.astype(jnp.float32)
        total_graphs = jax.lax.psum(num_graphs, dp_axis)
        weight = num_graphs / total_graphs
        grads = jax.lax.psum(
            jax.tree_util.tree_map(lambda g: g * weight, grads), dp_axis
        )
        grads = clip_grads_per_tensor(grads, clip_norm)
        lr = model._effective_lr(total_graphs)
        new_params, new_opt_state = model._optimizer.update(
            grads, opt_state, params, lr
        )
        red = {
            k: jax.lax.psum(jax.lax.pmean(v, gp_axis) * weight, dp_axis)
            for k, v in metrics.items()
        }
        red["total_graphs"] = total_graphs
        return new_params, new_opt_state, red

    sharded = shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P(), P(), P(dp_axis), P((dp_axis, gp_axis))),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0, 1))


# ---------------------------------------------------------------------------
# Local multi-process validation harness (virtual CPU devices)
# ---------------------------------------------------------------------------


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_multihost_check(num_processes: int = 2,
                        devices_per_process: int = 4,
                        timeout: float = 420.0) -> str:
    """Spawn `num_processes` local processes (each with
    `devices_per_process` virtual CPU devices), form the distributed
    mesh, run one DP train step, and assert gradient exactness vs a
    single-process computation of the same combined-batch update.

    Returns the worker's summary line; raises on any failure."""
    port = _free_port()
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    procs = []
    for pid in range(num_processes):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            "--xla_force_host_platform_device_count=%d" % devices_per_process
        )
        # Strip single-chip accelerator plugins (e.g. the axon TPU relay's
        # sitecustomize auto-registration) — the check runs on virtual CPU
        # devices and a pre-initialized backend would defeat
        # jax.distributed.initialize.
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
        pypath = [
            p for p in env.get("PYTHONPATH", "").split(os.pathsep)
            if p and "axon" not in p
        ]
        env["PYTHONPATH"] = os.pathsep.join([repo_root] + pypath)
        procs.append(subprocess.Popen(
            [sys.executable, "-m",
             "tf_gnn_samples_tpu.parallel._multihost_check",
             "--coordinator", "127.0.0.1:%d" % port,
             "--num-processes", str(num_processes),
             "--process-id", str(pid),
             "--devices-per-process", str(devices_per_process)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env=env, cwd=repo_root, text=True,
        ))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise RuntimeError("multihost check timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 or "MULTIHOST_OK" not in out:
            raise RuntimeError(
                "multihost worker %d failed (rc=%s):\n%s"
                % (pid, p.returncode, out[-4000:])
            )
    line = [ln for ln in outs[0].splitlines() if "MULTIHOST_OK" in ln][-1]
    return line

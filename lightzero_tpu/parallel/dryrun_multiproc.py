"""Two-process ``jax.distributed`` control-plane dry run.

The single-process dryrun phases prove sharded numerics == single-device,
but every ``parallel.distributed`` helper short-circuits at world_size 1.
This module launches TWO real OS processes that ``jax.distributed.
initialize`` against a localhost coordinator (CPU backend, 4 virtual
devices each -> one 8-device global world) and exercises the reference's
multi-host control plane (SURVEY.md §5.8,
train_unizero_multitask_segment_ddp.py:388-451) at world_size == 2:

  1. collector-stat allreduce (reference allreduce_data of collector
     stats, muzero_collector.py:609-614)
  2. eval-result broadcast from rank 0 (reference broadcast_object_list,
     alphazero_evaluator.py:305)
  3. task-weight broadcast: rank 0 computes symlog task weights from the
     all-gathered per-task returns, broadcasts them (reference
     :440-451) — and the task->rank partition helper
  4. a jitted global-mesh reduction over all 8 devices spanning both
     processes (the gradient-psum path: cross-process collective, not
     just host-side object transport)

Run one worker: ``python -m lightzero_tpu.parallel.dryrun_multiproc
<process_id> <num_processes> <port>``. Orchestrate: ``launch()`` (used by
the dryrun phase 5 and tests/test_distributed_multiproc.py).
"""
from __future__ import annotations

import os
import subprocess
import sys

_DEVICES_PER_PROC = 4
_OK_MARK = "MULTIPROC_CONTROL_PLANE_OK"


def _worker(process_id: int, num_processes: int, port: int) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={_DEVICES_PER_PROC}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from lightzero_tpu.parallel.distributed import (
        all_gather_scalars,
        allreduce_mean_scalars,
        barrier,
        broadcast_from_main,
        get_rank,
        init_distributed,
        is_main_process,
        partition_tasks,
    )

    info = init_distributed(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    assert info["world_size"] == num_processes, info
    assert info["rank"] == process_id, info
    assert is_main_process() == (process_id == 0)
    rank = get_rank()
    barrier("start")

    # 1. collector-stat allreduce: rank r contributes (r+1)*base
    stats = allreduce_mean_scalars(
        {"collect_return": 10.0 * (rank + 1), "env_steps": 100.0 * (rank + 1)}
    )
    want = {"collect_return": 15.0, "env_steps": 150.0}  # mean over ranks 1,2
    for k, v in want.items():
        np.testing.assert_allclose(stats[k], v, err_msg=f"allreduce {k}")

    # 2. eval broadcast: rank 0's (stop_flag, eval_reward) wins everywhere
    local_eval = np.asarray([1.0 if rank == 0 else -1.0, 42.5 + rank], np.float32)
    got = broadcast_from_main(local_eval)
    np.testing.assert_allclose(got, [1.0, 42.5], err_msg="eval broadcast")

    # 3. per-task returns all-gathered -> rank 0 computes symlog task
    #    weights -> broadcast (reference train_unizero_multitask_segment_
    #    ddp.py:440-451). Every rank must end up with rank 0's weights.
    task_returns = all_gather_scalars({"task_return": float(rank + 1)})
    gathered = task_returns["task_return"]  # (world,)
    np.testing.assert_allclose(gathered, [1.0, 2.0])
    if is_main_process():
        dist = np.abs(10.0 - gathered)  # distance-to-target
        sym = np.sign(dist) * np.log1p(np.abs(dist))
        weights = (sym / sym.sum()).astype(np.float32)
    else:
        weights = np.zeros((num_processes,), np.float32)
    weights = broadcast_from_main(weights)
    assert weights.sum() > 0 and abs(float(weights.sum()) - 1.0) < 1e-5, weights
    assert partition_tasks(5) == ([0, 1, 2] if rank == 0 else [3, 4])

    # 4. jitted global-mesh reduction across BOTH processes: the gradient
    #    psum path (dp_train_step's in-loss mean) as a real cross-process
    #    device collective, not host-side object transport.
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    n_global = num_processes * _DEVICES_PER_PROC
    assert len(jax.devices()) == n_global, len(jax.devices())
    mesh = Mesh(np.asarray(jax.devices()).reshape(n_global), ("dp",))
    local = jnp.arange(
        rank * _DEVICES_PER_PROC * 2, (rank + 1) * _DEVICES_PER_PROC * 2, dtype=jnp.float32
    )  # each process holds its own contiguous rows
    gl = multihost_utils.host_local_array_to_global_array(local, mesh, P("dp"))
    total = jax.jit(
        lambda x: jnp.sum(x), in_shardings=NamedSharding(mesh, P("dp")), out_shardings=None
    )(gl)
    np.testing.assert_allclose(
        np.asarray(total), sum(range(n_global * 2)), err_msg="global-mesh psum"
    )

    barrier("end")
    print(f"{_OK_MARK} rank={rank}/{num_processes}", flush=True)


def launch(num_processes: int = 2, port: int = 0, timeout: int = 420) -> str:
    """Spawn the workers, wait, and assert every rank printed the OK mark.
    Returns a one-line summary for the dryrun phase list."""
    if port == 0:
        import socket

        with socket.socket() as s:  # grab a free localhost port
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    # a parent's virtual-device XLA_FLAGS would double-apply in workers
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "lightzero_tpu.parallel.dryrun_multiproc",
             str(i), str(num_processes), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=repo, env=env,
        )
        for i in range(num_processes)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise RuntimeError("multiproc control-plane dryrun timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 or _OK_MARK not in out:
            raise RuntimeError(
                f"rank {i} failed (rc={p.returncode}):\n{out[-2000:]}"
            )
    return (
        f"control_plane@world_size={num_processes}: allreduce+eval_bcast+"
        f"task_weight_bcast+global_mesh_psum OK"
    )


if __name__ == "__main__":
    _worker(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))

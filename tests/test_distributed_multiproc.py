"""world_size==2 jax.distributed control plane (reference multi-host
surface, train_unizero_multitask_segment_ddp.py:388-451): two real OS
processes against a localhost coordinator exercise collector-stat
allreduce, eval broadcast, task-weight broadcast, and a cross-process
global-mesh reduction. Subprocess-based, so safe inside the (single
process) pytest run."""
import pytest

pytestmark = [pytest.mark.unittest, pytest.mark.slow]  # two fresh jax imports


def test_control_plane_world_size_2():
    from lightzero_tpu.parallel.dryrun_multiproc import launch

    summary = launch(num_processes=2)
    assert "world_size=2" in summary and "OK" in summary

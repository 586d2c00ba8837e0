"""Multi-host (multi-process) distributed training checks.

These launch REAL cooperating processes over jax.distributed with
virtual CPU devices — the strongest multi-host validation available
without DCN-connected hardware."""

import pytest

from tf_gnn_samples_tpu.parallel.multihost import (
    make_hybrid_mesh,
    run_multihost_check,
)


@pytest.mark.slow
def test_two_process_dp_matches_single_process():
    """2 processes x 4 virtual CPU devices: the distributed DP train step
    (each process feeding only its local batches) must reproduce the
    single-process combined-batch update; the same worker then drives the
    HYBRID (dp, gp) mesh — gp=2 graph-parallel groups inside each process,
    dp crossing the process boundary — through the task-generic GP step
    for BOTH strategies (all-gather and halo all_to_all), asserting
    exactness against the single-process combined weighted update on the
    unpartitioned batches."""
    line = run_multihost_check(num_processes=2, devices_per_process=4)
    assert "MULTIHOST_OK" in line
    assert "processes=2 devices=8" in line
    assert "hybrid_gp=2" in line
    import re

    for field in ("hybrid_allgather_diff", "hybrid_halo_diff"):
        m = re.search(field + r"=([0-9.e+-]+)", line)
        assert m, line
        assert float(m.group(1)) < 1e-4, line


def test_hybrid_mesh_orientation():
    """The (dp, gp) mesh must keep each gp group within one process so gp
    collectives ride ICI (single-process: within the local devices)."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")
    mesh = make_hybrid_mesh(gp=2)
    assert mesh.axis_names == ("dp", "gp")
    assert mesh.devices.shape == (len(jax.devices()) // 2, 2)
    # gp groups are contiguous device pairs:
    for row in mesh.devices:
        assert row[1].id == row[0].id + 1

    with pytest.raises(ValueError):
        make_hybrid_mesh(gp=3)  # does not divide the local count

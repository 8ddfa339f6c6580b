"""Worker process for the TRUE multi-process distributed test.

Launched by tests/test_multiprocess.py as `python tests/dist_worker.py
<pid> <nproc> <coordinator_port> <out_dir>`: each process owns 4 virtual
CPU devices, joins the jax.distributed coordination service via
parallel.launch.initialize_distributed (the wiring SURVEY §5 names
first-class — exercised nowhere else, VERDICT r4 #3), builds the SAME
deterministic submap problem, assembles process-local shards into global
arrays, and runs the spatial distributed keyframe adjustment over the
2-process x 4-device global mesh.  Process 0 writes the resulting params
to <out_dir>/params.npy for the parent to compare against a
single-process run.
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def main():
    pid, nproc, port, out_dir = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        sys.argv[3],
        sys.argv[4],
    )
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from dmsa_lidar_slam_tpu.parallel import launch

    launch.initialize_distributed(
        coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.process_index() == pid
    n_dev = len(jax.devices())
    assert n_dev == 4 * nproc, n_dev  # global device view spans processes

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dmsa_lidar_slam_tpu.parallel import keyframe_dist, launch as _l, spatial
    from tests.test_spatial_dist import _make_problem

    # identical problem on every process (same seed)
    rng = np.random.default_rng(9)
    shapes, data, params0, params_true = _make_problem(rng, with_normals=True)
    mesh = _l.global_keyframe_mesh()

    sopt = spatial.make_spatial_dist_optimize(
        mesh, shapes, num_iter=6, min_points=4, step_length=0.2, use_split=True
    )
    fp, fm, frs, aux = keyframe_dist.flatten_problem(data)
    fn = jnp.asarray(data.local_normals.reshape(-1, 3))
    grids = jnp.asarray([0.5, 1.25])

    def globalize(x, spec):
        """Host array -> global jax.Array: every process holds the full
        host value; each of its devices takes the shard the sharding
        assigns it (per-process data feeding over a multi-process mesh)."""
        sh = NamedSharding(mesh, spec)
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    args = (
        globalize(params0, P()),
        globalize(fp, P("data")),
        globalize(fm, P("data")),
        globalize(frs, P("data")),
        jax.tree.map(lambda a: globalize(a, P()), aux),  # replicated pytree
        globalize(grids, P()),
    )
    params_d, _, n_cells, overflow = sopt(*args, flat_normals=globalize(fn, P("data")))
    # outputs are replicated (out_specs P()) -> locally materializable
    params_local = np.asarray(params_d)
    if pid == 0:
        np.save(os.path.join(out_dir, "params.npy"), params_local)
        np.save(
            os.path.join(out_dir, "meta.npy"),
            np.asarray([float(n_cells), float(overflow)]),
        )
    jax.distributed.shutdown()
    print(f"worker {pid} done", flush=True)


if __name__ == "__main__":
    main()

"""Worker process for the multi-process (2-host) distributed CPU test.

Launched by tests/test_multiprocess.py as ``python multiprocess_worker.py
<pid> <nproc> <port> <datadir> <outdir>``.  Each process owns 2 virtual
CPU devices; together they form a 4-device global mesh — the CPU stand-in
for a multi-host TPU slice (SURVEY.md section 5's distributed backend).

The worker runs a full sharded fit from its own working directory and
dumps the host-side results (chain, moments) to ``result_<pid>.npz`` so
the test can assert cross-host agreement; IO gating is asserted by the
test via each process's private outdir contents.
"""
import os
import sys


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    datadir = sys.argv[4]
    outdir = sys.argv[5]
    mode = sys.argv[6] if len(sys.argv) > 6 else "fit"

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc
    assert len(jax.local_devices()) == 2

    import numpy as np

    from psfmc_tpu import model_galaxy_mcmc
    from psfmc_tpu.parallel import (
        is_primary,
        shard_walkers,
        walker_mesh,
    )

    assert is_primary() == (pid == 0)

    # global mesh over all processes' devices
    mesh = walker_mesh()
    assert mesh.devices.size == 2 * nproc, mesh.devices

    # host-local shard shapes: each process addresses exactly its own
    # 2 devices' shards of the walker axis
    nwalkers, dim = 32, 4
    arr = shard_walkers(np.arange(nwalkers * dim, dtype=np.float64)
                        .reshape(nwalkers, dim), mesh)
    local = arr.addressable_shards
    assert len(local) == 2, len(local)
    for sh in local:
        assert sh.data.shape == (nwalkers // (2 * nproc), dim), sh.data.shape
    # fetch round-trips the global array identically on every host
    from psfmc_tpu.parallel import fetch

    np.testing.assert_array_equal(
        fetch(arr), np.arange(nwalkers * dim).reshape(nwalkers, dim)
    )

    os.chdir(outdir)
    if mode == "resume":
        # SHARED outdir: run a short fit, then call the driver again
        # asking for more retained samples — the second call must take
        # the checkpoint-resume path on EVERY host (the post-write
        # barrier in save_database guarantees host 1 sees the DB file
        # before its own exists() check)
        common = dict(
            output_name="out_res",
            burn=20,
            chains=32,
            seed=5,
            mesh=mesh,
        )
        model = os.path.join(datadir, "model.py")
        db1 = model_galaxy_mcmc(model, iterations=20, **common)
        assert len(db1) == 32 * 20, len(db1)
        db = model_galaxy_mcmc(model, iterations=40, **common)
        assert len(db) == 32 * 40, len(db)
        np.savez(
            os.path.join(outdir, f"result_{pid}.npz"),
            sky=np.asarray(db["0_Sky_adu"], dtype=np.float64),
            mag=np.asarray(db["1_PointSource_mag"], dtype=np.float64),
            lnp=np.asarray(db["lnprobability"], dtype=np.float64),
        )
        print(f"worker {pid}: resume done", flush=True)
        return
    db = model_galaxy_mcmc(
        os.path.join(datadir, "model.py"),
        output_name="out_mp",
        iterations=40,
        burn=40,
        chains=32,
        seed=5,
        mesh=mesh,
    )

    # parallel tempering over the same global mesh (rungs replicated,
    # walkers sharded): a few steps, chains must agree across hosts
    from psfmc_tpu.models.multicomponent import MultiComponentModel
    from psfmc_tpu.parallel import walker_sharding
    from psfmc_tpu.sampler.tempered import PTEnsembleSampler

    model = MultiComponentModel(
        components=os.path.join(datadir, "model.py")
    )
    pt = PTEnsembleSampler(
        16,
        model.num_params,
        model.posterior_fns,
        ntemps=3,
        seed=7,
        sharding=walker_sharding(mesh),
    )
    rng = np.random.RandomState(11)
    pt.init_state(model.init_params_from_priors(16, random_state=rng))
    pt.run_burn(4)
    pt.reset()
    pt.run_sampling(4)
    assert pt.chain.shape == (16, 4, model.num_params)
    assert np.all(np.isfinite(pt.lnprobability))

    # NUTS over the same global mesh (chain axis sharded): a few
    # adaptation + retained steps; chains must agree across hosts
    from psfmc_tpu.sampler.nuts import NUTSSampler

    nuts = NUTSSampler(
        nwalkers=8,
        dim=model.num_params,
        posterior_fns=model.posterior_fns,
        seed=13,
        max_depth=4,
        sharding=walker_sharding(mesh),
    )
    nuts.init_state(model.init_params_from_priors(64, random_state=rng))
    nuts.run_burn(5)
    nuts.reset()
    nuts.run_sampling(5)
    assert nuts.chain.shape == (8, 5, model.num_params)
    assert np.all(np.isfinite(nuts.lnprobability))
    nuts_payload = nuts.checkpoint_payload()  # multi-host fetch path

    # batched multi-target fit with the TARGET axis sharded over the
    # global mesh; catalog written by the primary only
    from psfmc_tpu.batchfit import (
        fit_batch,
        save_batch_results,
        simulate_stack,
    )

    obs_stack, ivm_stack, injected = simulate_stack(model, 4, seed=17)
    bres = fit_batch(
        model, obs_stack, ivm_stack, burn=10, iterations=10, seed=19,
        mesh=mesh,
    )
    assert bres.num_targets == 4
    save_batch_results(bres, "out_batch.fits", injected=injected)

    np.savez(
        os.path.join(outdir, f"result_{pid}.npz"),
        sky=np.asarray(db["0_Sky_adu"], dtype=np.float64),
        mag=np.asarray(db["1_PointSource_mag"], dtype=np.float64),
        lnp=np.asarray(db["lnprobability"], dtype=np.float64),
        accept=np.asarray(db.meta["MCACCEPT"], dtype=np.float64),
        pt_chain=pt.chain,
        pt_lnp=pt.lnprobability,
        nuts_chain=nuts.chain,
        nuts_positions=nuts_payload["positions"],
        batch_mean=bres.mean,
        batch_std=bres.std,
        batch_map_lnp=bres.map_lnp,
    )
    print(f"worker {pid}: done", flush=True)


if __name__ == "__main__":
    main()

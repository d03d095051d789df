"""Multi-process (multi-host) execution semantics.

Launches TWO real OS processes, each owning 2 virtual CPU devices,
joined into one 4-device global mesh via ``jax.distributed`` (gloo
collectives) — the CPU stand-in for a multi-host TPU slice.  Asserts
the three multi-host contracts (SURVEY.md section 5, replacing the
reference's explicitly broken parallelism, reference fitting.py:55):

* the full sharded fit runs identically on every host (the device->host
  ``fetch`` replicates global arrays, so chains/statistics agree
  bit-for-bit),
* trace DB / checkpoint / posterior-image files are written by the
  PRIMARY host only,
* host-local shard shapes match the walker-axis layout (asserted inside
  the worker).
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from psfmc_tpu.io import fits

MODEL_TEMPLATE = """
from numpy import array
from psfMC.ModelComponents import Configuration, Sky, PointSource
from psfMC.distributions import Normal, Uniform

Configuration(obs_file='sci.fits', obsivm_file='ivm.fits',
              psf_files='psf.fits', psfivm_files='psf_ivm.fits',
              mag_zeropoint=25.0)
Sky(adu=Normal(loc=0.02, scale=0.01))
PointSource(xy=Uniform(loc=array((12., 12.)), scale=array((8., 8.))),
            mag=Uniform(loc=19.0, scale=1.5))
"""

NPROC = 2


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def datadir(tmp_path_factory):
    d = tmp_path_factory.mktemp("mp_data")
    rng = np.random.RandomState(1234)
    h = w = 32
    yy, xx = np.mgrid[0:h, 0:w].astype(float)
    psf = np.exp(-((xx - 16) ** 2 + (yy - 16) ** 2) / (2 * 1.5**2))
    psf /= psf.sum()
    truth = np.full((h, w), 0.02)
    truth[15, 17] += 10 ** (-0.4 * (19.8 - 25.0))
    conv = np.fft.irfft2(
        np.fft.rfft2(truth) * np.fft.rfft2(np.fft.ifftshift(psf)),
        s=truth.shape,
    )
    sig = 0.004
    obs = conv + rng.randn(h, w) * sig
    fits.writeto(str(d / "sci.fits"), obs.astype(np.float32))
    fits.writeto(
        str(d / "ivm.fits"), (np.ones_like(obs) / sig**2).astype(np.float32)
    )
    fits.writeto(str(d / "psf.fits"), psf.astype(np.float32))
    fits.writeto(
        str(d / "psf_ivm.fits"), (np.ones_like(psf) * 1e8).astype(np.float32)
    )
    (d / "model.py").write_text(MODEL_TEMPLATE)
    return d


@pytest.mark.slow
def test_two_process_sharded_fit(datadir, tmp_path):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multiprocess_worker.py")
    outdirs, procs = [], []
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (repo_root, env.get("PYTHONPATH")) if p
    )
    for pid in range(NPROC):
        outdir = tmp_path / f"proc{pid}"
        outdir.mkdir()
        outdirs.append(outdir)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    worker,
                    str(pid),
                    str(NPROC),
                    str(port),
                    str(datadir),
                    str(outdir),
                ],
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                env=env,
                text=True,
            )
        )
    outputs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"

    # exactly ONE process (the primary) wrote the DB + image products
    primary_files = sorted(
        f.name for f in outdirs[0].iterdir() if f.name != "result_0.npz"
    )
    assert "out_mp_db.fits" in primary_files
    assert "out_mp_residual.fits" in primary_files
    assert "out_batch.fits" in primary_files  # batch-fit catalog
    secondary_files = sorted(
        f.name for f in outdirs[1].iterdir() if f.name != "result_1.npz"
    )
    assert secondary_files == [], (
        f"non-primary host wrote files: {secondary_files}"
    )

    # every host computed the identical chain (bit-for-bit: the fetch
    # path replicates global arrays to all hosts)
    r0 = np.load(outdirs[0] / "result_0.npz")
    r1 = np.load(outdirs[1] / "result_1.npz")
    for key in (
        "sky", "mag", "lnp", "accept", "pt_chain", "pt_lnp",
        "nuts_chain", "nuts_positions",
        "batch_mean", "batch_std", "batch_map_lnp",
    ):
        np.testing.assert_array_equal(r0[key], r1[key])

    # the fit itself is sane (posterior found the injected source)
    assert np.mean(r0["mag"]) == pytest.approx(19.8, abs=0.15)
    assert 0.1 < float(r0["accept"]) < 0.9


@pytest.mark.slow
def test_two_process_checkpoint_resume(datadir, tmp_path):
    """Checkpoint-resume across hosts: a second driver call extending a
    fit must take the resume branch on EVERY process (the post-write
    barrier makes the DB visible before any host's exists() check —
    without it a racing host diverges and the collectives deadlock)."""
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multiprocess_worker.py")
    shared = tmp_path / "shared"
    shared.mkdir()
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (repo_root, env.get("PYTHONPATH")) if p
    )
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                worker,
                str(pid),
                str(NPROC),
                str(port),
                str(datadir),
                str(shared),
                "resume",
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for pid in range(NPROC)
    ]
    outputs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"

    r0 = np.load(shared / "result_0.npz")
    r1 = np.load(shared / "result_1.npz")
    for key in ("sky", "mag", "lnp"):
        np.testing.assert_array_equal(r0[key], r1[key])
    assert r0["lnp"].shape == (32 * 40,)

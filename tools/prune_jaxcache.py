#!/usr/bin/env python
"""Prune the committed .jaxcache to the live program set.

Policy (round-4 verdict item 6): the committed cache may contain only
entries touched by the canonical run set — ``dryrun_multichip`` (CPU
AOT programs), ``bench.py`` and ``tools/tpu_smoke.py`` (TPU
executables).  Everything else (stale shapes from spec changes,
one-off experiments) is deleted before commit.

Workflow::

    # 1. record manifests (keys appended, one per line)
    PSFMC_CACHE_MANIFEST=/tmp/m_dryrun.txt \
        python -c 'import __graft_entry__ as g; g.dryrun_multichip(8)'
    PSFMC_CACHE_MANIFEST=/tmp/m_bench.txt python bench.py      # on TPU
    PSFMC_CACHE_MANIFEST=/tmp/m_smoke.txt python tools/tpu_smoke.py

    # 2. preview, then apply
    python tools/prune_jaxcache.py /tmp/m_*.txt
    python tools/prune_jaxcache.py /tmp/m_*.txt --apply

``--record-dryrun`` runs the dryrun step itself (fresh subprocess, CPU
mesh) and includes its manifest automatically.  Files not matching the
``<key>-cache`` naming (e.g. XLA autotune subdirs) are left alone.

The cross-machine escape hatch is unchanged: CPU AOT entries embed the
compiling host's machine features; on an incompatible host set
``PSFMC_DRYRUN_NOCACHE=1`` (see __graft_entry__).
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def live_keys(manifests):
    keys = set()
    for path in manifests:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    keys.add(line)
    return keys


def record_dryrun(n_devices=8):
    """Run dryrun_multichip in a fresh subprocess, recording its keys."""
    fd, manifest = tempfile.mkstemp(prefix="jaxcache_manifest_")
    os.close(fd)
    env = dict(os.environ, PSFMC_CACHE_MANIFEST=manifest)
    print(f"# recording dryrun_multichip({n_devices}) cache keys ...",
          file=sys.stderr)
    subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; "
         f"g.dryrun_multichip({n_devices})"],
        cwd=REPO, env=env, check=True,
    )
    return manifest


def prune(cache_dir, keys, apply=False):
    kept, dropped, skipped = [], [], []
    for name in sorted(os.listdir(cache_dir)):
        path = os.path.join(cache_dir, name)
        if not (os.path.isfile(path) and name.endswith("-cache")):
            skipped.append(name)
            continue
        key = name[: -len("-cache")]
        if key in keys:
            kept.append(name)
        else:
            dropped.append(name)
            if apply:
                os.unlink(path)
    return kept, dropped, skipped


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Prune .jaxcache to the recorded live program set"
    )
    ap.add_argument("manifests", nargs="*",
                    help="manifest files from PSFMC_CACHE_MANIFEST runs")
    ap.add_argument("--cache-dir",
                    default=os.path.join(REPO, ".jaxcache"))
    ap.add_argument("--record-dryrun", action="store_true",
                    help="run dryrun_multichip(8) now and include its keys")
    ap.add_argument("--apply", action="store_true",
                    help="actually delete (default: preview only)")
    args = ap.parse_args(argv)

    manifests = list(args.manifests)
    if args.record_dryrun:
        manifests.append(record_dryrun())
    if not manifests:
        ap.error("no manifests given (and --record-dryrun not set)")

    keys = live_keys(manifests)
    kept, dropped, skipped = prune(args.cache_dir, keys, apply=args.apply)
    mb = sum(
        os.path.getsize(os.path.join(args.cache_dir, n))
        for n in kept
    ) / 1e6
    verb = "deleted" if args.apply else "would delete"
    print(f"# live keys: {len(keys)}; kept {len(kept)} entries "
          f"({mb:.1f} MB); {verb} {len(dropped)}; "
          f"left alone {len(skipped)} non-cache entries")
    for name in dropped:
        print(f"{verb}: {name}")
    if dropped and not args.apply:
        print("# preview only — re-run with --apply", file=sys.stderr)


if __name__ == "__main__":
    main()

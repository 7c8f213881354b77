"""Integration: the notebook-equivalent example runs end-to-end on a
synthetic dataset (tiny sizes; the full workflow incl. CRF compare + eval)."""

import os
import subprocess
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def voc_dir(tmp_path_factory):
    from PIL import Image
    root = tmp_path_factory.mktemp("voc_ex")
    (root / "JPEGImages" / "train").mkdir(parents=True)
    (root / "SegmentationClassAug").mkdir()
    rng = np.random.RandomState(0)
    for i in range(30):
        img = np.zeros((48, 48, 3), np.uint8)
        img[:] = (40, 90, 160)
        cy, cx, r = rng.randint(12, 36), rng.randint(12, 36), rng.randint(6, 12)
        yy, xx = np.mgrid[:48, :48]
        m = (yy - cy) ** 2 + (xx - cx) ** 2 < r ** 2
        img[m] = (220, 60, 50)
        Image.fromarray(img).save(
            root / "JPEGImages" / "train" / f"im{i:02d}.jpg", quality=95)
        Image.fromarray(m.astype(np.uint8), mode="L").save(
            root / "SegmentationClassAug" / f"im{i:02d}.png")
    return str(root)


@pytest.mark.slow
def test_example_workflow_runs(voc_dir, tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    # The child needs ONE cpu device: if the invoking shell exported
    # --xla_force_host_platform_device_count=8 (harmless for the suite,
    # whose conftest sets devices via jax.config), the child would
    # inherit 8 virtual devices and thrash a single-core box into the
    # subprocess timeout.  Strip it, and pin the count explicitly.
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count"))
    env["JAX_NUM_CPU_DEVICES"] = "1"
    # CPU-only child: keep the dev-env sitecustomize from registering the
    # TPU plugin in it (minutes-long connect backoffs when the tunnel is
    # unhealthy) — see deeplab_tpu/hostenv.py
    from deeplab_tpu.hostenv import strip_tpu_plugin_env
    strip_tpu_plugin_env(env)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    # share the suite's persistent compile cache with the subprocess
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(repo, ".jax_cache")
    env["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"] = "0"
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0"
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "examples",
                                      "segmentation_workflow.py"),
         "--dataset", voc_dir, "--image-size", "32", "32",
         "--batch-size", "4", "--epochs", "2",
         "--out-dir", str(tmp_path / "w")],
        env=env, cwd=str(tmp_path), capture_output=True, text=True,
        # generous: on a contended single-core box the subprocess (own jax
        # init + compiles even with the shared cache) can exceed 600s
        timeout=1500)
    assert proc.returncode == 0, proc.stderr[-3000:]
    out = proc.stdout
    assert "sample mIOU (no CRF):" in out
    assert "sample mIOU (+CRF):" in out
    assert 'Published-metric "Mean IOU"' in out

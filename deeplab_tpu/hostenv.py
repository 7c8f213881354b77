"""Host-environment hygiene for CPU-only child processes.

The dev environment's sitecustomize (PYTHONPATH=.axon_site) registers the
TPU PJRT plugin in EVERY python interpreter, gated only on
``PALLAS_AXON_POOL_IPS`` — it ignores ``JAX_PLATFORMS``.  When the TPU
tunnel is unhealthy that registration sleeps in minutes-long connect
backoffs before the child's first line of code runs.  Children that are
CPU-only by design (test subprocesses, the multichip dry run, data-pipeline
workers, notebook executors) must therefore hide the variable.
"""

from __future__ import annotations

import contextlib
import os

# every var that makes the baked sitecustomize take the TPU-plugin path
TPU_PLUGIN_VARS = ("PALLAS_AXON_POOL_IPS",)


def strip_tpu_plugin_env(env: dict) -> dict:
    """Drop the TPU-plugin trigger vars from a child-env dict (mutates and
    returns it, for ``subprocess.run(env=strip_tpu_plugin_env(dict(os.environ)))``)."""
    for k in TPU_PLUGIN_VARS:
        env.pop(k, None)
    return env


@contextlib.contextmanager
def tpu_plugin_env_hidden():
    """Temporarily hide the trigger vars in ``os.environ`` (exception-safe)
    while in-process machinery (forkserver, notebook kernel) starts child
    interpreters that must not touch the TPU plugin."""
    saved = {k: os.environ.pop(k) for k in TPU_PLUGIN_VARS
             if k in os.environ}
    try:
        yield
    finally:
        os.environ.update(saved)

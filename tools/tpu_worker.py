"""Persistent TPU REPL worker: amortizes the ~2-min axon client init.

Watches /tmp/tpuq/ for NNN.py files, execs each in a shared namespace,
appends output to /tmp/tpuq/NNN.out (with EXIT marker).  Job-created
globals are dropped after each job — device arrays kept alive by the
shared namespace otherwise accumulate until the chip's HBM is exhausted
(imported modules persist, so the amortization is preserved).  Dev tool
only.
"""
import gc
import io
import contextlib
import glob
import os
import time
import traceback
import types

QDIR = "/tmp/tpuq"
os.makedirs(QDIR, exist_ok=True)

import jax  # noqa: E402  (init early so the tunnel warmup happens now)
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

ns = {"jax": jax, "jnp": jnp, "np": np, "time": time}
print("worker ready; devices:", jax.devices(), flush=True)
open(os.path.join(QDIR, "READY"), "w").write("ok")

seen = set()
while True:
    for path in sorted(glob.glob(os.path.join(QDIR, "*.py"))):
        if path in seen:
            continue
        seen.add(path)
        out_path = path[:-3] + ".out"
        buf = io.StringIO()
        t0 = time.time()
        try:
            with contextlib.redirect_stdout(buf):
                exec(compile(open(path).read(), path, "exec"), ns)
            status = "OK"
        except Exception:
            buf.write(traceback.format_exc())
            status = "ERR"
        with open(out_path, "w") as f:
            f.write(buf.getvalue())
            f.write(f"\n== {status} in {time.time() - t0:.2f}s ==\n")
        for k in [k for k, v in ns.items()
                  if k not in ("jax", "jnp", "np", "time")
                  and not isinstance(v, types.ModuleType)]:
            del ns[k]
        gc.collect()
    time.sleep(0.5)

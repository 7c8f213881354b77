"""Generate committed CRF golden outputs: the exact O(N^2) mean-field
(densecrf conventions, crf/brute.py) on the shared structured scenes.
These anchor both CRF backends independently of the approximate solvers
(VERDICT r1 #4 — pydensecrf itself is not installable here; the oracle
implements the published Krähenbühl & Koltun Algorithm 1 with densecrf's
defaults: symmetric normalization, self-excluded, 5 iterations)."""
import os, sys, time
root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, root)
sys.path.insert(0, os.path.join(root, "tests"))
import numpy as np
from crf_scenes import SCENES, make_scene
from deeplab_tpu.crf.brute import exact_crf_map

out_dir = os.path.join(root, "tests", "goldens", "crf")
os.makedirs(out_dir, exist_ok=True)
for name, H, W, L, seed in SCENES:
    t0 = time.time()
    im, mask = make_scene(H, W, L, seed)
    golden = exact_crf_map(im, mask, zero_unsure=False)
    np.savez_compressed(os.path.join(out_dir, name + ".npz"),
                        golden=golden.astype(np.uint8),
                        changed=np.mean(golden != mask))
    print(f"{name}: {time.time()-t0:.0f}s, crf changed "
          f"{np.mean(golden != mask):.3f} of pixels", flush=True)
print("done")

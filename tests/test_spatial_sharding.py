"""Spatial sharding: training with the image height sharded over the mesh
'space' axis must match unsharded training (XLA inserts conv halo exchange)."""

import numpy as np
import jax

from deeplab_tpu.parallel.mesh import get_mesh
from deeplab_tpu.train.trainer import Trainer
from tests.test_trainer import FakeGen, TinySegNet


def test_spatial_sharded_step_matches_unsharded():
    model = TinySegNet()
    gen = FakeGen(n_batches=2, bs=8)

    params, state = model.init(jax.random.key(0))
    tr_plain = Trainer(model, epochs=2, lr=1e-2, verbose=0,
                       mesh=get_mesh(jax.devices()[:1]))
    h_plain = tr_plain.fit(params, state, gen)

    params2, state2 = model.init(jax.random.key(0))
    mesh = get_mesh(jax.devices()[:8], data=4, space=2)
    tr_sp = Trainer(model, epochs=2, lr=1e-2, verbose=0, mesh=mesh,
                    spatial=True)
    h_sp = tr_sp.fit(params2, state2, gen)

    np.testing.assert_allclose(h_plain["loss"], h_sp["loss"], rtol=1e-4)
    for layer in tr_plain.params:
        for k in tr_plain.params[layer]:
            np.testing.assert_allclose(
                np.asarray(tr_plain.params[layer][k]),
                np.asarray(tr_sp.params[layer][k]), rtol=1e-4, atol=1e-5)

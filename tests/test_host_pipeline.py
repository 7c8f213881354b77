"""Host data pipeline: thread prefetcher + multiprocess worker pool wired
into Trainer.fit (reference fit_generator semantics, utils.py:231-241)."""

import numpy as np
import pytest

from deeplab_tpu.data.generator import (ArrayBatcher, MultiprocessPrefetcher,
                                        Prefetcher)


class CountingGen:
    """Deterministic generator that records __getitem__ calls and returns
    index-stamped batches from a reused buffer (aliasing trap)."""

    def __init__(self, n=7, bs=2):
        self.n, self.batch_size = n, bs
        self.buf = np.zeros((bs, 4, 4, 3), np.float32)
        self.calls = []

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        self.calls.append(i)
        self.buf[:] = i  # overwrite the shared buffer every call
        Y = np.full((self.batch_size, 16, 1), i, np.float32)
        return self.buf, Y, {"pred_mask": np.full((self.batch_size, 16), i,
                                                  np.float32)}

    def on_epoch_end(self):
        pass


@pytest.mark.parametrize("cls,kw", [(Prefetcher, {}),
                                    (MultiprocessPrefetcher, {"workers": 3})])
def test_prefetchers_ordered_complete_unaliased(cls, kw):
    gen = CountingGen()
    pf = cls(gen, **kw)
    batches = list(pf)
    assert len(batches) == len(gen)
    for i, (X, Y, sw) in enumerate(batches):
        # ordered + every batch is a private copy (the generator's shared
        # buffer was overwritten by later batches)
        assert float(X[0, 0, 0, 0]) == i
        assert float(Y[0, 0, 0]) == i
        assert float(sw["pred_mask"][0, 0]) == i
    # second iteration works (fresh workers/queue)
    assert len(list(pf)) == len(gen)


def test_trainer_uses_pipeline_and_matches_sync():
    import jax
    from deeplab_tpu.models.seg_model import SegNet
    from deeplab_tpu.train.trainer import Trainer

    rng = np.random.RandomState(0)
    X = rng.rand(8, 32, 32, 3).astype(np.float32) * 255
    Y = rng.randint(0, 21, (8, 32 * 32)).astype(np.float32)
    model = SegNet((32, 32), 21, "mobilenetv2", "original")
    params, state = model.init(jax.random.key(0))

    def run(workers, mp):
        gen = ArrayBatcher(X, Y, 4, n_classes=21)
        tr = Trainer(model, epochs=2, verbose=0, workers=workers,
                     use_multiprocessing=mp)
        hist = tr.fit(params, state, gen)
        return hist["loss"]

    sync = run(0, False)
    threaded = run(1, False)
    multi = run(3, True)
    np.testing.assert_allclose(sync, threaded, rtol=1e-6)
    np.testing.assert_allclose(sync, multi, rtol=1e-6)


class FailingGen:
    batch_size = 2

    def __len__(self):
        return 3

    def __getitem__(self, i):
        if i == 1:
            raise ValueError("corrupt image")
        return (np.zeros((2, 4, 4, 3), np.float32),
                np.zeros((2, 16, 1), np.float32),
                {"pred_mask": np.zeros((2, 16), np.float32)})

    def on_epoch_end(self):
        pass


@pytest.mark.parametrize("cls,kw", [(Prefetcher, {}),
                                    (MultiprocessPrefetcher, {"workers": 2})])
def test_pipeline_worker_errors_propagate(cls, kw):
    """A generator exception must surface as RuntimeError, not hang the
    training loop on a dead producer."""
    with pytest.raises(RuntimeError):
        list(cls(FailingGen(), **kw))


class RngGen:
    """Batches from the (forked) worker's numpy RNG stream."""
    batch_size = 1

    def __len__(self):
        return 2

    def __getitem__(self, i):
        x = np.random.rand(1, 4, 4, 3).astype(np.float32)
        return x, np.zeros((1, 16, 1), np.float32), {"pred_mask":
                                                     np.zeros((1, 16),
                                                              np.float32)}

    def on_epoch_end(self):
        pass


def test_mp_prefetcher_reseeds_across_epochs():
    """Forked workers get epoch-dependent seeds — augmentation streams must
    differ between epochs (the pipeline object lives across epochs)."""
    pf = MultiprocessPrefetcher(RngGen(), workers=2, seed=0)
    e1 = [b[0].copy() for b in pf]
    e2 = [b[0].copy() for b in pf]
    assert not all(np.array_equal(a, b) for a, b in zip(e1, e2))

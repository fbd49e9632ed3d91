"""Input pipeline tests: deterministic epoch batching + device prefetch."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skrample_tpu.data import EpochLoader, prefetch_to_device
from skrample_tpu.parallel import latent_sharding, make_mesh


def _loader(batch=4, count=10, key=0):
    data = {
        "x": np.arange(count * 3, dtype=np.float32).reshape(count, 3),
        "y": np.arange(count, dtype=np.int32),
    }
    return EpochLoader(data, batch, jax.random.PRNGKey(key)), data


def test_epoch_permutation_covers_everything_once():
    loader, data = _loader(batch=5, count=10)
    seen = []
    for step, b in zip(range(2), loader):  # one full epoch = 2 batches of 5
        seen.extend(np.asarray(b["y"]).tolist())
    assert sorted(seen) == list(range(10))
    # labels ride with their examples
    b0 = loader.batch_at(0)
    np.testing.assert_array_equal(np.asarray(b0["x"])[:, 0], np.asarray(b0["y"]) * 3)


def test_deterministic_and_resumable():
    loader_a, _ = _loader()
    loader_b, _ = _loader()
    stream = list(itertools.islice(iter(loader_a), 7))
    # same seed -> same stream
    for got, ref in zip(itertools.islice(iter(loader_b), 7), stream):
        np.testing.assert_array_equal(np.asarray(got["y"]), np.asarray(ref["y"]))
    # O(1) resume: batch_at(k) == the k-th yielded batch (across epochs)
    for k in (0, 1, 2, 5, 6):
        np.testing.assert_array_equal(np.asarray(loader_a.batch_at(k)["y"]), np.asarray(stream[k]["y"]))
    # different epochs shuffle differently
    e0 = np.asarray(loader_a.batch_at(0)["y"])
    e1 = np.asarray(loader_a.batch_at(loader_a.per_epoch)["y"])
    assert not np.array_equal(e0, e1)


def test_loader_validation():
    with pytest.raises(ValueError, match="leading example axis"):
        EpochLoader({"x": np.zeros((4, 2)), "y": np.zeros(5)}, 2, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="> dataset size"):
        EpochLoader({"x": np.zeros((4, 2))}, 8, jax.random.PRNGKey(0))


def test_prefetch_matches_raw_iterator():
    loader, _ = _loader()
    raw = list(itertools.islice(iter(loader), 6))
    pre = list(itertools.islice(prefetch_to_device(iter(loader)), 6))
    for got, ref in zip(pre, raw):
        assert isinstance(got["x"], jax.Array)
        np.testing.assert_array_equal(np.asarray(got["x"]), np.asarray(ref["x"]))


def test_prefetch_places_with_sharding():
    mesh = make_mesh(dp=4)
    loader, _ = _loader(batch=4, count=8)
    sharding = latent_sharding(mesh, 0, ndim=2)

    def place(batch):
        return {"x": jax.device_put(batch["x"], sharding), "y": jax.device_put(batch["y"])}

    out = next(prefetch_to_device(iter(loader), place=place))
    assert out["x"].sharding.spec == sharding.spec
    assert len({s.device for s in out["x"].addressable_shards}) == 4


def test_prefetch_terminates_and_propagates_errors():
    assert list(prefetch_to_device(iter([]))) == []
    assert [int(v) for v in prefetch_to_device(iter([jnp.asarray(1), jnp.asarray(2)]))] == [1, 2]

    def bad():
        yield jnp.asarray(1)
        raise RuntimeError("producer broke")

    it = prefetch_to_device(bad())
    assert int(next(it)) == 1
    with pytest.raises(RuntimeError, match="producer broke"):
        list(it)


def test_prefetch_trains_end_to_end():
    "The loader + prefetch feed a jitted step without shape surprises."
    loader, _ = _loader(batch=4, count=12)

    @jax.jit
    def step(acc, batch):
        return acc + jnp.sum(batch["x"]) + jnp.sum(batch["y"])

    acc = jnp.zeros(())
    host_acc = 0.0
    for batch in itertools.islice(prefetch_to_device(iter(loader), depth=3), 9):
        acc = step(acc, batch)
        host_acc += float(np.sum(np.asarray(batch["x"]))) + float(np.sum(np.asarray(batch["y"])))
    np.testing.assert_allclose(float(acc), host_acc, rtol=1e-6)


def test_ragged_tail_kept_when_not_dropping():
    "drop_remainder=False yields the short final batch of each epoch."
    loader, _ = _loader(batch=4, count=10)
    assert loader.per_epoch == 2  # default drops the ragged pair

    data = {"y": np.arange(10, dtype=np.int32)}
    keep = EpochLoader(data, 4, jax.random.PRNGKey(0), drop_remainder=False)
    assert keep.per_epoch == 3
    sizes = [np.asarray(keep.batch_at(n)["y"]).shape[0] for n in range(3)]
    assert sizes == [4, 4, 2]
    seen = np.concatenate([np.asarray(keep.batch_at(n)["y"]) for n in range(3)])
    assert sorted(seen.tolist()) == list(range(10))

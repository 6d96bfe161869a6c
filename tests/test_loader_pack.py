"""Packed host->device batch staging (data.loader.pack_batch/unpack_batch)."""

import numpy as np
import jax
import jax.numpy as jnp

from depthg_tpu.data.loader import pack_batch, unpack_batch
from depthg_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD


def _normalized(u8):
    mean = np.asarray(IMAGENET_MEAN, np.float32)[:, None, None]
    std = np.asarray(IMAGENET_STD, np.float32)[:, None, None]
    return ((u8.astype(np.float32) / 255.0) - mean) / std


def test_pack_unpack_round_trip_exact():
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (4, 3, 16, 16)).astype(np.uint8)
    batch = {
        "img": _normalized(u8),
        "img_pos": _normalized(rng.integers(0, 256, (4, 3, 16, 16)).astype(np.uint8)),
        "label": rng.integers(-1, 27, size=(4, 16, 16)),
        "depth": rng.random((4, 1, 16, 16)).astype(np.float32),
        "mask": rng.random((4, 16, 16)) > 0.5,
    }
    bufs, spec = pack_batch(batch, set(batch) | {"absent"})
    kinds = {k: d for k, d, *_ in spec}
    # ImageNet-normalized images ride the uint8 buffer (4x less transfer);
    # small ints and bools ride it too; non-integral floats (depth here)
    # stay f32
    assert kinds["img"] == kinds["img_pos"] == "imagenet_u8"
    assert kinds["label"] == "int_u8_off1" and kinds["mask"] == "bool_u8"
    assert kinds["depth"] == "float32"
    assert bufs[1].dtype == np.uint8

    out = jax.jit(unpack_batch, static_argnums=1)(
        tuple(map(jnp.asarray, bufs)), spec)
    assert sorted(out) == sorted(batch)
    # images: exact round-trip through the uint8 inversion (atol only for
    # the device-side re-normalization arithmetic)
    np.testing.assert_allclose(np.asarray(out["img"]), batch["img"], atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(out["label"]).astype(np.int64), batch["label"])
    np.testing.assert_array_equal(np.asarray(out["mask"]), batch["mask"])
    np.testing.assert_array_equal(np.asarray(out["depth"]), batch["depth"])


def test_pack_integral_float_depth_rides_u8():
    """Depth decoded from 8-bit PNGs (integer-valued floats in [0, 255])
    transfers as uint8 exactly."""
    rng = np.random.default_rng(2)
    depth = rng.integers(0, 256, (3, 1, 8, 8)).astype(np.float32)
    bufs, spec = pack_batch({"depth": depth}, {"depth"})
    assert spec[0][1] == "raw_u8"
    out = jax.jit(unpack_batch, static_argnums=1)(
        tuple(map(jnp.asarray, bufs)), spec)
    got = np.asarray(out["depth"])
    assert got.dtype == np.float32
    np.testing.assert_array_equal(got, depth)


def test_pack_falls_back_for_non_quantized_images():
    """Tensors that are NOT (u8/255 - mean)/std must ride the f32 buffer."""
    rng = np.random.default_rng(1)
    batch = {"img": rng.standard_normal((2, 3, 8, 8)).astype(np.float32) * 50}
    bufs, spec = pack_batch(batch, {"img"})
    assert spec[0][1] == "float32"
    out = jax.jit(unpack_batch, static_argnums=1)(
        tuple(map(jnp.asarray, bufs)), spec)
    np.testing.assert_array_equal(np.asarray(out["img"]), batch["img"])


def test_loader_propagates_worker_exceptions():
    """A failing __getitem__ must raise in the consumer, not hang or look
    like a clean end-of-epoch (the producer thread forwards exceptions)."""
    import pytest

    from depthg_tpu.data.loader import DataLoader

    class Bad:
        def __len__(self):
            return 4

        def __getitem__(self, i, rng=None):
            raise OSError(f"corrupt item {i}")

    loader = DataLoader(Bad(), batch_size=2, num_workers=2)
    with pytest.raises(OSError, match="corrupt item"):
        list(loader)


def test_device_prefetch_propagates_staging_exceptions():
    from depthg_tpu.data.loader import device_prefetch
    import pytest

    def gen():
        yield {"x": np.zeros(3)}
        raise RuntimeError("stage boom")

    out = []
    with pytest.raises(RuntimeError, match="stage boom"):
        for item in device_prefetch(gen(), lambda b: b):
            out.append(item)
    assert len(out) == 1  # the good batch arrived first

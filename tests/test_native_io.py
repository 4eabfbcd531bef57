"""Native data-loader tests: parity with the PIL path, fallback behavior."""

import os

import numpy as np
import pytest

from patent_tpu.input import decode_image
from patent_tpu.input.native import (
    decode_batch_native,
    decode_image_native,
    native_available,
    probe_native,
)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native library not built")


@pytest.fixture(scope="module")
def pngs(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("native_pngs")
    rng = np.random.default_rng(0)
    paths = {}
    rgb = rng.integers(0, 255, (96, 80, 3), np.uint8)
    Image.fromarray(rgb).save(root / "rgb.png")
    paths["rgb"] = (str(root / "rgb.png"), rgb)
    gray = rng.integers(0, 255, (64, 64), np.uint8)
    Image.fromarray(gray, "L").save(root / "gray.png")
    paths["gray"] = (str(root / "gray.png"), gray)
    rgba = rng.integers(0, 255, (50, 70, 4), np.uint8)
    Image.fromarray(rgba, "RGBA").save(root / "rgba.png")
    paths["rgba"] = (str(root / "rgba.png"), rgba)
    pal = Image.fromarray(rgb).convert("P", palette=Image.ADAPTIVE)
    pal.save(root / "palette.png")
    paths["palette"] = (str(root / "palette.png"), None)
    bad = root / "corrupt.png"
    bad.write_bytes(b"\x89PNG\r\n\x1a\nnot really")
    paths["corrupt"] = (str(bad), None)
    return paths


def test_probe(pngs):
    path, rgb = pngs["rgb"]
    assert probe_native(path) == (80, 96, 3)
    assert probe_native(pngs["corrupt"][0]) is None


@pytest.mark.parametrize("kind", ["rgb", "gray", "rgba", "palette"])
def test_native_matches_pil(pngs, kind):
    path, _ = pngs[kind]
    nat = decode_image_native(path, 32)
    pil = decode_image(path, 32)
    assert nat is not None and pil is not None
    assert nat.shape == pil.shape == (32, 32, 3)
    # decoders agree to within resampling tolerance (both bilinear, slightly
    # different tap placement at borders)
    diff = np.abs(nat - pil)
    assert float(np.mean(diff)) < 0.15, f"mean diff {diff.mean()}"
    assert float(np.median(diff)) < 0.1


def test_native_corrupt_returns_none(pngs):
    assert decode_image_native(pngs["corrupt"][0], 32) is None


def test_batch_decode(pngs):
    paths = [pngs["rgb"][0], pngs["corrupt"][0], pngs["gray"][0]]
    batch, ok = decode_batch_native(paths, 32, num_threads=2)
    assert batch.shape == (3, 32, 32, 3)
    assert ok.tolist() == [True, False, True]
    assert np.all(batch[1] == 0)          # failed row left zero
    single = decode_image_native(paths[0], 32)
    np.testing.assert_array_equal(batch[0], single)


def test_exact_pixels_at_native_resolution(pngs):
    """At source resolution == target size the decode must be exact."""
    from PIL import Image

    from patent_tpu.input import CLIP_MEAN, CLIP_STD

    path, _ = pngs["rgb"]
    with Image.open(path) as im:
        pass
    # create an exact-size image
    rng = np.random.default_rng(1)
    exact = rng.integers(0, 255, (32, 32, 3), np.uint8)
    p = os.path.join(os.path.dirname(path), "exact.png")
    Image.fromarray(exact).save(p)
    nat = decode_image_native(p, 32)
    want = (exact.astype(np.float32) / 255.0 - CLIP_MEAN) / CLIP_STD
    np.testing.assert_allclose(nat, want, atol=1e-5)


def test_u8_path_matches_f32_through_model(pngs):
    """decode u8 → device normalize → model == decode f32 → model."""
    import jax
    import jax.numpy as jnp

    from patent_tpu.input.native import decode_batch_native, decode_batch_native_u8
    from patent_tpu.models.vit import VIT_TINY, VisionTransformer
    from patent_tpu.retrieval.engine import make_device_normalizing_encoder

    paths = [pngs["rgb"][0], pngs["gray"][0]]
    f32, ok1 = decode_batch_native(paths, 32)
    u8, ok2 = decode_batch_native_u8(paths, 32)
    assert ok1.all() and ok2.all()

    model = VisionTransformer(VIT_TINY)
    params = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    apply_jit = jax.jit(model.apply)
    y_f32 = apply_jit(params, jnp.asarray(f32))
    enc_u8 = make_device_normalizing_encoder(model.apply, params)
    y_u8 = enc_u8(jnp.asarray(u8))
    # uint8 rounding costs ≤ half an LSB of [0,1] pixel range
    np.testing.assert_allclose(np.asarray(y_u8), np.asarray(y_f32),
                               atol=5e-2, rtol=5e-2)


def test_oversize_png_rejected_not_crashed(tmp_path):
    """A crafted IHDR claiming near-2^31 dimensions must return an error
    code (pixel cap, patent_io.cc decode_png), not overflow size
    computations, allocate gigabytes, or terminate the process."""
    import struct
    import zlib

    from patent_tpu.input.native import decode_image_native, native_available

    if not native_available():
        pytest.skip("native lib not built")

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    for w, h in ((2**31 - 16, 8), (8, 2**31 - 16), (70000, 70000),
                 (16384, 16384)):
        ihdr = struct.pack(">IIBBBBB", w & 0xFFFFFFFF, h & 0xFFFFFFFF,
                           8, 2, 0, 0, 0)
        png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", zlib.compress(b"\x00" * 64))
               + chunk(b"IEND", b""))
        p = tmp_path / f"huge_{w}x{h}.png"
        p.write_bytes(png)
        out = decode_image_native(str(p), 32)
        assert out is None   # rejected, process alive

    # zero / negative dims are rejected too
    ihdr = struct.pack(">IIBBBBB", 0, 10, 8, 2, 0, 0, 0)
    p = tmp_path / "zero.png"
    p.write_bytes(b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                  + chunk(b"IDAT", zlib.compress(b"\x00" * 8))
                  + chunk(b"IEND", b""))
    assert decode_image_native(str(p), 32) is None

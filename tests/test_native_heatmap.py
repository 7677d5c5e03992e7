"""Native C++ heatmap kernels vs the PIL/numpy serving fallback.

The serving request path's PNG heatmap (the mobile contract's default —
/root/reference/Groove/app/(tabs)/ResultScreen.tsx:26-35 renders the
base64 `heatmap` under the waveform) is produced by
ecgmm_tpu/native/heatmap.cpp when the toolchain is available:

 * ecgmm_cam_overlay — fused bilinear CAM upsample + jet blend. The
   contract is BIT-IDENTICAL pixels to the fallback
   (Image.fromarray(cam, "F").resize(BILINEAR) then
   explain.gradcam.overlay_heatmap): the C++ reproduces PIL's triangle
   taps (double weights, float32 horizontal intermediate) and numpy's
   float32 blend expressions.
 * ecgmm_png_encode_sub — Sub-filtered, band-parallel-deflate PNG. The
   contract is a spec-valid PNG whose decoded pixels equal the input
   exactly (any decoder; we assert via PIL).
"""

import io

import numpy as np
import pytest
from PIL import Image

from ecgmm_tpu import native
from ecgmm_tpu.explain.gradcam import _jet_lut, overlay_heatmap

pytestmark = pytest.mark.skipif(
    not native.heatmap_available(), reason="no C++ toolchain or no zlib"
)


def _fallback_overlay(image_u8, cam, alpha=0.4):
    cam_full = np.asarray(
        Image.fromarray(np.asarray(cam, np.float32), mode="F").resize(
            (image_u8.shape[1], image_u8.shape[0]),
            Image.Resampling.BILINEAR,
        )
    )
    return overlay_heatmap(image_u8, cam_full, alpha=alpha)


@pytest.mark.parametrize(
    "hw,cam_hw",
    [
        ((250, 2500), (7, 7)),     # reference strip, ResNet18 7x7 CAM
        ((224, 224), (7, 7)),      # model-resolution image
        ((123, 457), (5, 9)),      # odd sizes, non-square CAM
        ((40, 40), (77, 13)),      # downsampling axes too
        ((3, 5), (1, 1)),          # degenerate CAM
    ],
    ids=["strip", "square224", "odd", "downsample", "degenerate"],
)
def test_cam_overlay_bit_exact(rng, hw, cam_hw):
    img = rng.integers(0, 256, (*hw, 3), dtype=np.uint8)
    # exercise the clip path with values outside [0, 1]
    cam = (rng.random(cam_hw, dtype=np.float32) * 1.3 - 0.1).astype(
        np.float32
    )
    ref = _fallback_overlay(img, cam)
    nat = native.cam_overlay(img, cam, _jet_lut())
    np.testing.assert_array_equal(ref, nat)


def test_cam_overlay_alpha_variants(rng):
    img = rng.integers(0, 256, (64, 96, 3), dtype=np.uint8)
    cam = rng.random((7, 7), dtype=np.float32)
    for alpha in (0.0, 0.25, 0.4, 1.0):
        np.testing.assert_array_equal(
            _fallback_overlay(img, cam, alpha),
            native.cam_overlay(img, cam, _jet_lut(), alpha=alpha),
        )


def test_cam_overlay_input_validation(rng):
    lut = _jet_lut()
    with pytest.raises(ValueError):
        native.cam_overlay(
            np.zeros((4, 4), np.uint8), np.zeros((2, 2), np.float32), lut
        )
    with pytest.raises(ValueError):
        native.cam_overlay(
            np.zeros((4, 4, 3), np.uint8), np.zeros((2,), np.float32), lut
        )
    with pytest.raises(ValueError):
        native.cam_overlay(
            np.zeros((4, 4, 3), np.uint8),
            np.zeros((2, 2), np.float32),
            np.zeros((4, 3), np.uint8),
        )


@pytest.mark.parametrize(
    "hw",
    [(1, 1), (1, 513), (15, 257), (16, 16), (250, 2500), (333, 41)],
    ids=["pixel", "row", "one-band", "band-edge", "strip", "tall"],
)
def test_png_roundtrip_exact(rng, hw):
    img = rng.integers(0, 256, (*hw, 3), dtype=np.uint8)
    png = native.png_encode(img)
    dec = Image.open(io.BytesIO(png))
    assert dec.mode == "RGB"
    np.testing.assert_array_equal(np.asarray(dec), img)


def test_png_levels_and_size(rng):
    """Higher zlib levels still decode exactly; compressible content
    actually compresses (a flat strip beats raw size by a lot)."""
    img = np.full((250, 2500, 3), 235, np.uint8)
    img[100:110] = 20
    for level in (1, 6, 9):
        png = native.png_encode(img, level=level)
        np.testing.assert_array_equal(
            np.asarray(Image.open(io.BytesIO(png)).convert("RGB")), img
        )
    assert len(native.png_encode(img, level=1)) < img.size // 10


def test_png_matches_random_content_of_pil(rng):
    """PIL's own encoder decodes our stream and vice versa — sanity that
    the band-stitched deflate is one valid zlib stream (adler32 is
    verified by the decoder)."""
    img = rng.integers(0, 256, (77, 123, 3), dtype=np.uint8)
    png = native.png_encode(img, level=6)
    # PIL re-encode → decode both, equal pixels
    buf = io.BytesIO()
    Image.open(io.BytesIO(png)).save(buf, format="PNG")
    np.testing.assert_array_equal(
        np.asarray(Image.open(buf).convert("RGB")), img
    )


def test_serving_gate_env(monkeypatch):
    from ecgmm_tpu.serve import api

    monkeypatch.setenv("ECGMM_NO_NATIVE_HEATMAP", "1")
    assert api._native_heatmap() is None
    monkeypatch.delenv("ECGMM_NO_NATIVE_HEATMAP")
    assert api._native_heatmap() is native

import numpy as np
import pytest
from scipy import ndimage

from inklayer_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("g++ unavailable")
    return lib


def test_exact_edt_matches_scipy(lib, rng):
    seeds = rng.random((40, 50)) > 0.95
    seeds[0, 0] = True
    ours = native.exact_edt(seeds)
    ref = ndimage.distance_transform_edt(~seeds)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_connected_components_matches_scipy(lib, rng):
    mask = rng.random((30, 40)) > 0.7
    ours, n_ours = native.connected_components(mask, 8)
    ref, n_ref = ndimage.label(mask, structure=np.ones((3, 3)))
    assert n_ours == n_ref
    # same partition
    pairs = {(int(a), int(b)) for a, b in zip(ours[mask], ref[mask])}
    assert len(pairs) == n_ours


def test_watershed_basic(lib):
    markers = np.zeros((20, 20), np.int32)
    markers[5, 2] = 1
    markers[5, 17] = 2
    elevation = np.zeros((20, 20), np.float32)
    region = np.ones((20, 20), np.uint8)
    labels = native.watershed(markers, elevation, region)
    assert labels[5, 4] == 1
    assert labels[5, 15] == 2
    assert (labels > 0).all()


def test_watershed_respects_region(lib):
    markers = np.zeros((10, 10), np.int32)
    markers[5, 1] = 1
    region = np.zeros((10, 10), np.uint8)
    region[5, :] = 1
    labels = native.watershed(markers, np.zeros((10, 10), np.float32), region)
    assert labels[5, 8] == 1
    assert labels[2, 2] == 0


def test_watershed_elevation_barrier(lib):
    """Label expansion follows ascending elevation: the lower-barrier side is
    claimed by the nearer seed."""
    markers = np.zeros((10, 21), np.int32)
    markers[5, 0] = 1
    markers[5, 20] = 2
    elev = np.zeros((10, 21), np.float32)
    elev[:, 8] = 100.0  # wall closer to seed 1
    labels = native.watershed(markers, elev,
                              np.ones((10, 21), np.uint8))
    assert labels[5, 5] == 1
    assert labels[5, 12] == 2
    # the wall itself is flooded last from the cheaper side; both claims legal
    assert (labels > 0).all()


def test_device_chamfer_vs_native_edt(lib, rng):
    """Our TPU chamfer approximation stays within its documented bound of
    the exact native EDT."""
    import jax.numpy as jnp

    from inklayer_tpu.ops.distance import chamfer_distance

    seeds = np.zeros((48, 48), bool)
    seeds[10, 12] = True
    seeds[30, 40] = True
    exact = native.exact_edt(seeds)
    approx = np.asarray(chamfer_distance(jnp.asarray(seeds), iters=60))
    assert (approx >= exact - 1e-4).all()
    assert (approx <= exact * 1.09 + 1e-4).all()


def test_png_encode_roundtrip(lib, rng):
    import io

    from PIL import Image

    if not hasattr(lib, "png_encode"):
        pytest.skip("stale libhost_ops without png_encode")
    rgb = (rng.random((37, 53, 3)) * 255).astype(np.uint8)
    gray = (rng.random((41, 29)) * 255).astype(np.uint8)
    mask = ((rng.random((25, 31)) > 0.5) * 255).astype(np.uint8)
    for arr, mode in ((rgb, "RGB"), (gray, "L")):
        data = native.png_encode(arr)
        dec = np.asarray(Image.open(io.BytesIO(data)).convert(mode))
        assert np.array_equal(dec, arr)
    data = native.png_encode(mask, bilevel=True)
    im = Image.open(io.BytesIO(data))
    assert im.mode == "1"
    assert np.array_equal(np.asarray(im.convert("L")), mask)


def test_save_png_matches_pil_pixels(tmp_path, rng):
    from PIL import Image

    from inklayer_tpu.io.outputs import save_png

    arr = (rng.random((30, 44, 3)) * 255).astype(np.uint8)
    save_png(str(tmp_path / "a.png"), arr)
    assert np.array_equal(np.asarray(Image.open(tmp_path / "a.png")), arr)


def test_save_masks_dir_bilevel_roundtrip(tmp_path, rng):
    """Mask PNGs ride the 1-bit native path; every pipeline consumer
    normalizes via convert('L') > 127, which must recover the exact mask."""
    from PIL import Image

    from inklayer_tpu.io.outputs import save_masks_dir

    masks = rng.random((3, 21, 37)) > 0.5
    save_masks_dir(masks, str(tmp_path))
    for i in range(3):
        got = np.asarray(
            Image.open(tmp_path / f"mask_{i}.png").convert("L")) > 127
        assert np.array_equal(got, masks[i])


def test_integral_nonzero_matches_numpy(rng):
    from inklayer_tpu.native import integral_nonzero

    gray = (rng.random((53, 71)) * 255).astype(np.uint8)
    gray[gray < 128] = 0
    want = np.pad((gray > 0).astype(np.int64),
                  ((1, 0), (1, 0))).cumsum(0).cumsum(1)
    got = integral_nonzero(gray)
    assert got.dtype == np.int32
    assert np.array_equal(got, want)

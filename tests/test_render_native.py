"""Parity of the native C++ renderer against the numpy reference ray-caster.

The C++ port (data/_render_native.cpp) must produce the same images as the
numpy path for both styles: same camera, CSG rules, face/texture/shading
math. Small float differences are expected (numpy rounds the object-frame
camera origin through float32 before the double-precision ray math; the C++
path keeps it in double), so the tolerance is 1e-4 — far below the 1/255
quantization of the on-disk datasets. Discrete-decision pixels (checker
cell edges, slab-argmax ties) could legitimately flip between backends at
exact boundaries; none occur at these poses, and the assertion would catch
a systematic convention error regardless (any face/axis mix-up shifts whole
regions, not isolated boundary pixels).
"""
import numpy as np
import pytest

from lie_vae_tpu.data import render


def _poses(n, seed=0):
    from scipy.spatial.transform import Rotation
    return Rotation.random(n, random_state=seed).as_matrix().astype(
        np.float32)


@pytest.fixture(scope="module")
def native_available():
    if render._load_native() is None:
        pytest.skip("native renderer unavailable (no g++)")


@pytest.mark.parametrize("style", ["v1", "v2"])
def test_native_matches_numpy(style, native_available):
    R = _poses(8)
    a = render.render_spherecube(R, style=style, backend="numpy")
    b = render.render_spherecube(R, style=style, backend="native")
    assert b.dtype == np.float32 and b.shape == a.shape
    np.testing.assert_allclose(b, a, atol=1e-4)


def test_native_single_pose_and_sizes(native_available):
    R = _poses(1)[0]
    a = render.render_spherecube(R, size=32, style="v2", backend="numpy")
    b = render.render_spherecube(R, size=32, style="v2", backend="native")
    assert b.shape == (32, 32, 3)
    np.testing.assert_allclose(b, a, atol=1e-4)


def test_v2_has_more_pose_signal():
    """The v2 style exists to fix the measured v1 weakness: the SSE between
    renders at independent poses must be several times larger (BENCHMARKS
    '32k renders' section — v1's weak pose signal drives posterior drift).
    """
    R = _poses(64, seed=1)
    v1 = render.render_spherecube(R, style="v1")
    v2 = render.render_spherecube(R, style="v2")
    pair_sse = lambda im: float(
        ((im[:32] - im[32:]) ** 2).sum(axis=(1, 2, 3)).mean())
    assert pair_sse(v2) > 3.0 * pair_sse(v1)


def test_unknown_backend_and_style():
    R = _poses(1)
    with pytest.raises(ValueError):
        render.render_spherecube(R, style="v3")
    with pytest.raises(ValueError):
        render.render_spherecube(R, backend="gpu")

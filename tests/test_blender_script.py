"""Execute data/blender_spherecube.py under a bpy test double.

The image has no Blender binary, so the render script itself would
otherwise never run. These tests install minimal fake ``bpy`` /
``mathutils`` modules and drive the real script end-to-end — through the
same subprocess seam the CLI uses (``gen_spherecube --blender``) — and
assert the *protocol* the reference pipeline pins
(/root/reference/blender_spherecube.py:19-87,
/root/reference/lie_vae/experiments/gen_spherecube_pairs.py:30-32):

- one render call per pose, write_still=True;
- the object's world matrix is exactly the requested rotation (the spec
  ships row-major 3x3 matrices, convention-unambiguous);
- output filenames embed the pose quaternion in the 4-decimal format the
  dataset loaders parse back (shapes.py _QUAT_RE), and the parsed
  quaternion reproduces the rotation that was rendered;
- scene setup: square resolution at the requested size, PNG output, a
  camera on the -Y axis at distance 5 tracking the object (the
  reference's camera geometry), and the boolean sphere cut hidden from
  render.
"""
import json
import os
import runpy
import sys
import types

import numpy as np
import pytest

from lie_vae_tpu.data._np_ops import quaternions_to_group_matrix_np
from lie_vae_tpu.data.shapes import filename_to_quaternion

SCRIPT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "lie_vae_tpu", "data",
    "blender_spherecube.py")


class _Recorder:
    """Shared log of every bpy action the script takes."""

    def __init__(self):
        self.renders = []          # (filepath, matrix_world at call time)
        self.objects = []
        self.factory_reset = 0


class _FakeMatrix:
    def __init__(self, rows):
        self.rows = np.asarray(rows, dtype=np.float64)

    def to_4x4(self):
        out = np.eye(4)
        out[:3, :3] = self.rows
        return _FakeMatrix4(out)


class _FakeMatrix4:
    def __init__(self, arr):
        self.arr = arr


class _Obj:
    def __init__(self, kind, location=(0.0, 0.0, 0.0)):
        self.kind = kind
        self.location = tuple(location)
        self.data = types.SimpleNamespace(
            materials=[], polygons=[types.SimpleNamespace(material_index=0)
                                    for _ in range(6)])
        self.modifiers = _ModList()
        self.constraints = _ConstraintList()
        self.hide_render = False
        self.matrix_world = _FakeMatrix4(np.eye(4))


class _ModList:
    def __init__(self):
        self.items = []

    def new(self, name, kind):
        mod = types.SimpleNamespace(name=name, kind=kind, operation=None,
                                    object=None)
        self.items.append(mod)
        return mod


class _ConstraintList:
    def __init__(self):
        self.items = []

    def new(self, type):
        con = types.SimpleNamespace(type=type, target=None, track_axis=None,
                                    up_axis=None)
        self.items.append(con)
        return con


def _make_fake_bpy(rec):
    bpy = types.ModuleType("bpy")
    scene = types.SimpleNamespace(
        render=types.SimpleNamespace(
            resolution_x=0, resolution_y=0, filepath="",
            image_settings=types.SimpleNamespace(file_format="")),
        camera=None)
    context = types.SimpleNamespace(scene=scene, active_object=None)

    def _add(kind):
        def op(**kw):
            obj = _Obj(kind, location=kw.get("location", (0.0, 0.0, 0.0)))
            rec.objects.append(obj)
            context.active_object = obj
        return op

    def _read_factory_settings(use_empty=False):
        rec.factory_reset += 1

    def _render(write_still=False):
        assert write_still, "script must render with write_still=True"
        # the active object is the sphere; the CUBE is what the script
        # rotates — record the cube's world matrix at render time
        cube = next(o for o in rec.objects if o.kind == "cube")
        rec.renders.append((scene.render.filepath,
                            cube.matrix_world.arr.copy()))
        # behave like Blender: write the still to the exact filepath
        # (it already carries the .png extension)
        with open(scene.render.filepath, "wb") as f:
            f.write(b"\x89PNG fake")

    class _Materials:
        @staticmethod
        def new(name):
            return types.SimpleNamespace(name=name, diffuse_color=None)

    bpy.context = context
    bpy.data = types.SimpleNamespace(materials=_Materials())
    bpy.ops = types.SimpleNamespace(
        wm=types.SimpleNamespace(read_factory_settings=_read_factory_settings),
        mesh=types.SimpleNamespace(primitive_cube_add=_add("cube"),
                                   primitive_uv_sphere_add=_add("sphere")),
        object=types.SimpleNamespace(light_add=_add("light"),
                                     camera_add=_add("camera")),
        render=types.SimpleNamespace(render=_render))

    mathutils = types.ModuleType("mathutils")
    mathutils.Matrix = _FakeMatrix
    return bpy, mathutils


def _run_script_with_spec(spec_path, rec, monkeypatch):
    bpy, mathutils = _make_fake_bpy(rec)
    monkeypatch.setitem(sys.modules, "bpy", bpy)
    monkeypatch.setitem(sys.modules, "mathutils", mathutils)
    monkeypatch.setattr(sys, "argv",
                        ["blender", "--background", "--python", SCRIPT,
                         "--", spec_path])
    runpy.run_path(SCRIPT, run_name="__main__")


def test_blender_script_protocol(tmp_path, monkeypatch):
    rng = np.random.RandomState(0)
    # two exact rotations with 4-decimal-representable quaternions would be
    # contrived; instead build rotations FROM round-tripped quaternions so
    # the filename parse can be asserted exactly
    q = rng.randn(3, 4)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    q = np.round(q, 4)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    mats = quaternions_to_group_matrix_np(q.astype(np.float64))
    names = ["{:06d}_0_{:.4f}_{:.4f}_{:.4f}_{:.4f}.png".format(i, *qi)
             for i, qi in enumerate(q)]

    out_dir = tmp_path / "renders"
    out_dir.mkdir()
    spec = {"matrices": mats.tolist(), "names": names,
            "out_dir": str(out_dir), "size": 48}
    spec_path = tmp_path / "spec.json"
    spec_path.write_text(json.dumps(spec))

    rec = _Recorder()
    _run_script_with_spec(str(spec_path), rec, monkeypatch)

    # scene protocol
    assert rec.factory_reset == 1
    scene = sys.modules["bpy"].context.scene
    assert (scene.render.resolution_x, scene.render.resolution_y) == (48, 48)
    assert scene.render.image_settings.file_format == "PNG"
    cam = next(o for o in rec.objects if o.kind == "camera")
    assert scene.camera is cam
    np.testing.assert_allclose(cam.location, (0.0, -5.0, 0.0))
    track = cam.constraints.items[0]
    assert track.type == "TRACK_TO"
    assert track.target.kind == "cube"
    cube = next(o for o in rec.objects if o.kind == "cube")
    assert len(cube.data.materials) == 6
    mod = cube.modifiers.items[0]
    assert mod.operation == "INTERSECT" and mod.object.kind == "sphere"
    assert mod.object.hide_render     # boolean cutter must not render

    # one render per pose, world matrix == requested rotation, file written
    assert len(rec.renders) == len(names)
    for (path, world), m, name in zip(rec.renders, mats, names):
        assert os.path.basename(path) == name
        assert os.path.exists(path)
        np.testing.assert_allclose(world[:3, :3], m, atol=1e-12)
        np.testing.assert_allclose(world[3], [0, 0, 0, 1], atol=0)

    # the filenames round-trip through the dataset loaders' parser to the
    # rendered rotation (same regex as the reference, datasets.py:67-72)
    for name, m in zip(names, mats):
        q_back = np.asarray(filename_to_quaternion(name))
        m_back = quaternions_to_group_matrix_np(q_back)
        np.testing.assert_allclose(m_back, m, atol=1e-4)


def test_cli_blender_seam(tmp_path, monkeypatch):
    """gen_spherecube --blender produces a spec the script consumes: patch
    the subprocess seam to run the real script in-process under the fake
    bpy and check the rendered poses equal the generator's rotations."""
    import subprocess

    from lie_vae_tpu.cli import gen_spherecube

    rec = _Recorder()
    calls = {}

    def fake_check_call(cmd):
        assert cmd[:3] == ["blender", "--background", "--python"]
        assert cmd[3] == SCRIPT and cmd[4] == "--"
        calls["spec"] = cmd[5]
        _run_script_with_spec(cmd[5], rec, monkeypatch)

    monkeypatch.setattr(subprocess, "check_call", fake_check_call)
    out_dir = tmp_path / "bl"
    names = gen_spherecube.generate(2, str(out_dir), 2 * np.pi / 60,
                                    size=32, pairs=True, seed=3,
                                    use_blender=True)
    assert len(rec.renders) == 4          # 2 pairs x 2 poses
    with open(calls["spec"]) as f:
        spec = json.load(f)
    flat_names = [n for row in names for n in row]
    assert spec["names"] == flat_names
    for (path, world), m in zip(rec.renders, spec["matrices"]):
        np.testing.assert_allclose(world[:3, :3], m, atol=1e-12)
        assert os.path.exists(path)
    # rendered pose quaternions parse back consistently with the matrices
    for name, m in zip(flat_names, spec["matrices"]):
        q_back = np.asarray(filename_to_quaternion(name))
        np.testing.assert_allclose(
            quaternions_to_group_matrix_np(q_back), np.asarray(m), atol=1e-3)
    os.unlink(calls["spec"])


def test_blender_script_importable_only_in_blender():
    """Outside Blender the module import must fail on bpy, not on syntax."""
    with pytest.raises(ModuleNotFoundError, match="bpy"):
        runpy.run_path(SCRIPT, run_name="not_main")

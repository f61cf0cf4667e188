"""Mesh-construction unit tests (squarest factorizations, pod fallback)."""

import jax

from hpgmg_tpu.parallel.mesh import (_factor3, make_mesh, make_mesh_ij,
                                     make_pod_mesh)


def test_factor3_squarest():
    """ProcessGridFindSquarest analog (sampler.c:19-41)."""
    assert _factor3(8) == (2, 2, 2)
    assert _factor3(1) == (1, 1, 1)
    assert _factor3(4) == (2, 2, 1)
    assert _factor3(12) == (3, 2, 2)
    assert _factor3(64) == (4, 4, 4)


def test_mesh_ij_keeps_lanes_whole():
    n = len(jax.devices())
    mesh = make_mesh_ij()
    assert mesh.shape["z"] == 1
    assert mesh.shape["x"] * mesh.shape["y"] == n
    assert mesh.shape["x"] >= mesh.shape["y"]


def test_pod_mesh_single_slice_fallback():
    """CPU devices carry no slice_index -> make_pod_mesh must degrade to
    the plain 3D mesh (the DCN dimension only exists across real slices)."""
    mesh = make_pod_mesh()
    ref = make_mesh()
    assert dict(mesh.shape) == dict(ref.shape)

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


def test_graduated_agglomeration_ladder():
    """Mid-ladder levels keep partial sharding on the surviving axes —
    the graduated agglomeration ladder (mg.c:894-952) instead of a
    binary sharded/replicated jump; GRADUATED=False restores the
    binary rule."""
    import pytest
    from jax.sharding import PartitionSpec as P

    from hpgmg_tpu.parallel import mesh as M

    mesh = M.make_mesh_ij()
    if dict(mesh.shape) != {"x": 4, "y": 2, "z": 1}:
        pytest.skip("needs the 4x2x1 virtual mesh")
    assert M.level_sharding(mesh, 64).spec == P("x", "y", None)
    assert M.level_sharding(mesh, 32).spec == P("x", "y", None)
    # x drops (16//4 = 4 < AGGLOMERATION_START), y survives (16//2 = 8)
    assert M.level_sharding(mesh, 16).spec == P(None, "y", None)
    assert M.level_sharding(mesh, 8).spec == P()
    old = M.GRADUATED
    M.GRADUATED = False
    try:
        assert M.level_sharding(mesh, 16).spec == P()
        assert M.level_sharding(mesh, 32).spec == P("x", "y", None)
    finally:
        M.GRADUATED = old


def test_pod_mesh_emulated_slices():
    """Explicit n_slices emulates the hybrid layout on virtual devices:
    the DCN factor rides outermost on z, consecutive device blocks form
    one slice each (so the z halo crosses the slice boundary at exactly
    one plane)."""
    import jax

    devs = jax.devices()
    if len(devs) < 4:
        import pytest

        pytest.skip("needs >= 4 devices")
    mesh = make_pod_mesh(devs[:4], n_slices=2)
    # 2 devices per slice -> per-slice (2,1,1); z = 1*2 slices
    assert dict(mesh.shape) == {"x": 2, "y": 1, "z": 2}
    arr = mesh.devices
    # slice 0 = devices 0,1; slice 1 = devices 2,3; z is the slice axis
    assert arr[0, 0, 0] == devs[0] and arr[1, 0, 0] == devs[1]
    assert arr[0, 0, 1] == devs[2] and arr[1, 0, 1] == devs[3]
